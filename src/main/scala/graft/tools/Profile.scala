package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry: time named queries (or all) one by one on a
  * given sf dir. `runMain graft.tools.Profile <sfDir> [query ...]`. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // exercise the cluster-iteration storage seam from the command
    // line: GRAFT_CLUSTER_ITER_DIR=<path> routes the component loop's
    // per-round state through an explicit (shared-storage-style) root
    sys.env.get("GRAFT_CLUSTER_ITER_DIR")
      .foreach(d => spark.conf.set("graft.cluster.iterDir", d))
    // and the hop-unroll factor (default 1 = one action per hop;
    // k>1 measured slower at local[32], see PERF.md round 6)
    sys.env.get("GRAFT_CLUSTER_HOPS")
      .foreach(k => spark.conf.set("graft.cluster.hopsPerRound", k))
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val sel: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      if (names.isEmpty) graft.SparkEntry.queries.toSeq.sortBy(_._1)
      else names.toSeq.map(n => n -> graft.SparkEntry.queries(n))
    for ((name, fn) <- sel; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case e: Throwable => println(s"$name FAILED: $e"); -1L }
      println(f"$name%-24s rep$rep ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
