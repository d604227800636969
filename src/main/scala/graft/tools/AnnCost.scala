package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure incremental ANN index maintenance vs full rebuild — the
  * PERF.md evidence behind `pipelines.AnnIndex`'s claim that a
  * release increment re-pairs only touched cells. Splits the
  * embeddings by vec_id into vN and a fixed-size delta (the highest
  * |n| ids — the realistic new-release regime), builds the vN state,
  * then times `incrementState` against a timed full rebuild and
  * checks graph equality. NOT part of the driver contract — local
  * tooling. `runMain graft.tools.AnnCost <sfDir> [deltaRows]` */
object AnnCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val deltaRows = args.lift(1).map(_.toInt).getOrElse(500)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val emb = graft.Tables.embeddings(spark, sfDir)
    val cut = emb.select("vec_id").orderBy(col("vec_id").desc)
      .limit(deltaRows).agg(min(col("vec_id"))).first().getLong(0)
    val vN = emb.where(col("vec_id") < cut)
    val delta = emb.where(col("vec_id") >= cut)
    println(s"corpus ${emb.count()} vectors; delta ${delta.count()}")

    val base = java.nio.file.Files.createTempDirectory("graft_anncost").toString
    graft.pipelines.AnnIndex.buildState(spark, vN, s"$base/vn")
    spark.catalog.clearCache()
    time("incrementState (delta)") {
      graft.pipelines.AnnIndex.incrementState(spark, delta, s"$base/vn", s"$base/vn1")
    }
    spark.catalog.clearCache()
    time("buildState (full)") {
      graft.pipelines.AnnIndex.buildState(spark, emb, s"$base/full")
    }
    val g1 = spark.read.parquet(graft.pipelines.AnnIndex.graphPath(s"$base/vn1"))
    val g2 = spark.read.parquet(graft.pipelines.AnnIndex.graphPath(s"$base/full"))
    println(s"graph equal: ${g1.exceptAll(g2).count() == 0 && g2.exceptAll(g1).count() == 0}")
    spark.stop()
  }
}
