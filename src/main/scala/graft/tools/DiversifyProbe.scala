package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.ops.Similarity

/** Measures whether DiskANN-style neighbor diversification
  * (occlusion pruning, `Similarity.navTopKDiversified`) reconnects
  * the navigable graph on a near-dup-clustered corpus — the ×100
  * fragmentation regime `tools.RetrievalScale` exposed (every
  * neighbor slot taken by a same-cluster twin ⇒ walk recall 0/30).
  * Builds BOTH graphs over the given corpus, walks both with the
  * scaled hop count, prints recall side by side. NOT part of the
  * driver contract — evidence for promoting diversification into the
  * default build (which requires mirroring the occlusion join in the
  * oracle's `navBuildCtes`).
  * `runMain graft.tools.DiversifyProbe <dirWithEmbeddingsParquet>` */
object DiversifyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_retr_scale6/x10")
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
      println(f"$label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val base = Similarity.vecsOf(spark, graft.Tables.embeddings(spark, dir))
      .select("vec_id", "v", "norm").persist()
    val n = base.count()
    println(s"corpus $n vectors ($dir)")
    val q = base.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))

    // exact filtered-to-nothing brute force top-3 (the truth)
    def d = VectorFunctions.dot(spark, col("qv"), col("nv"))
    val wb = Window.partitionBy("qid").orderBy(col("cos").desc, col("node"))
    val bf3 = base.select(col("vec_id").as("node"),
        col("v").as("nv"), col("norm").as("nnorm"))
      .join(broadcast(q), col("node") =!= col("qid"))
      .withColumn("cos", round(d / (col("qnorm") * col("nnorm")), 6))
      .withColumn("rk", row_number().over(wb))
      .where(col("rk") <= 3)
      .select(col("qid"), col("node").as("nbr_id")).persist()
    bf3.count()

    for (diversified <- Seq(false, true)) {
      val tag = if (diversified) "diversified" else "plain"
      val (edges, release) = time(s"$tag graph build")(
        Similarity.navGraphRounds(spark, base, Similarity.navSeedCand(base), diversified))
      val e = edges.localCheckpoint(true)
      release()
      val hits = time(s"$tag walk") {
        val (walk, wRelease) = Similarity.beamSearchReleasable(spark, base, q, e)
        val h = walk.select("qid", "nbr_id").join(bf3, Seq("qid", "nbr_id")).count()
        wRelease(); h
      }
      println(s"$tag recall: $hits/${bf3.count()}")
    }
    spark.stop()
  }
}
