package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of every SparkEntry query —
  * review surface for pushdown/broadcast/codegen checks.
  * `runMain graft.tools.Plans <sfDir> [query ...]` */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSet
    // session confs mirror graft.Bench (same broadcast threshold /
    // shuffle posture) so the dumped plans are the shapes the driver's
    // bench actually executes
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "33554432")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      // Let AQE re-optimize INSIDE cached plans (default false): the
      // engine's materialize-before-fan-out discipline persists most
      // intermediates, and with the default every shuffle below an
      // InMemoryRelation keeps all 32 tiny partitions — 32-task
      // dispatch on sub-MB stages. Interleaved TailProbe A/B on the
      // persist-heavy subset: ON 10.45/11.36 s vs OFF 11.95/12.85 s.
      // Scale-neutral: AQE sizes partitions from data, and the one
      // partitioning-sensitive consumer (withGlobalRank) pins its
      // range exchange with an explicit N, which AQE never coalesces.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names.isEmpty || names(name)) {
        println(s"\n===================== $name =====================")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"EXPLAIN FAILED: $e") }
      }
    }
    spark.stop()
  }
}
