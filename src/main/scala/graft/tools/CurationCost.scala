package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the materialized-curation topology (`pipelines.Curation`)
  * against the independent-query shape: build the cluster table once,
  * then time deriving apply/curate from the materialized table vs
  * recomputing the loop inside each query.
  * `runMain graft.tools.CurationCost [sfDir] [root]`. */
object CurationCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val root = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_curation_cost").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    def timed[A](label: String)(body: => A): A = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    timed("build_clusters (once)") {
      graft.pipelines.Curation.buildClusters(spark, sfDir, root)
    }
    timed("derive apply (materialized)") {
      graft.pipelines.Curation.applyDeduped(spark, sfDir, root).count()
    }
    timed("derive curate (materialized)") {
      graft.pipelines.Curation.curationDecision(spark, sfDir, root).count()
    }
    timed("dedup_apply (independent query)") {
      graft.ops.Dedup.applyDedup(spark, sfDir).count()
    }
    timed("text_curate (independent query)") {
      graft.ops.Text.curate(spark, sfDir).count()
    }
    spark.stop()
  }
}
