package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure incremental navigable-graph maintenance vs full rebuild —
  * the PERF.md evidence behind `pipelines.NavIndex`'s claim that a
  * release increment re-ranks only the change frontier. Same protocol
  * as `AnnCost`: highest-|n|-ids delta, vN state prebuilt, increment
  * timed against a timed full rebuild, graph equality checked. NOT
  * part of the driver contract — local tooling.
  * `runMain graft.tools.NavCost <sfDir> [deltaRows]` */
object NavCost {
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

    // frontier evidence: how many nodes share a band bucket with the
    // delta (the seed-round recompute set) vs the corpus
    val vAll = graft.ops.Similarity.vecsOf(spark, emb)
    val bands = graft.ops.Similarity.navBands(vAll)
    val touched = bands.join(
      delta.select("vec_id"), "vec_id").select("b", "key").distinct()
    println(s"seed frontier: ${bands.join(touched, Seq("b", "key")).select("vec_id").distinct().count()} " +
      s"of ${emb.count()} nodes (delta-touched buckets: ${touched.count()})")

    val base = java.nio.file.Files.createTempDirectory("graft_navcost").toString
    graft.pipelines.NavIndex.buildState(spark, vN, s"$base/vn")
    spark.catalog.clearCache()
    time("incrementState (delta)") {
      graft.pipelines.NavIndex.incrementState(spark, delta, s"$base/vn", s"$base/vn1")
    }
    spark.catalog.clearCache()
    time("buildState (full)") {
      graft.pipelines.NavIndex.buildState(spark, emb, s"$base/full")
    }
    val a = graft.pipelines.NavIndex.graph(spark, s"$base/vn1")
    val b = graft.pipelines.NavIndex.graph(spark, s"$base/full")
    val ok = a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0
    println(s"graphs identical: $ok (${a.count()} edges)")
    spark.stop()
  }
}
