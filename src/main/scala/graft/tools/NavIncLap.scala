package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot lap profile of a nav-index increment against an
  * ALREADY-LANDED prior state — re-runs just the increment leg of
  * `NavMaintainScale` (with GRAFT_DEBUG=1 for the `[navinc]` laps)
  * without paying the builds again. Used for the PERF.md lap anatomy:
  * which phases remain after the band/width state versioning, and do
  * any scale with the corpus rather than the frontier.
  * `runMain graft.tools.NavIncLap <embParquet> <priorRoot> <nextRoot> [labelEq]` */
object NavIncLap {
  def main(args: Array[String]): Unit = {
    val emb = args(0); val prior = args(1); val next = args(2)
    val labelEq = args.lift(3).map(_.toLong)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val e = spark.read.parquet(emb)
    val delta = labelEq.map(l => e.where(col("label") === l)).getOrElse(e)
    val t0 = System.nanoTime()
    graft.pipelines.NavIndex.incrementState(spark, delta, prior, next)
    println(f"incrementState total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
