package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query-overhead experiment harness for the bench TAIL — the
  * ~200 sub-second queries whose summed cost is dominated by fixed
  * per-query constants (parquet schema inference, plan optimization,
  * AQE stage re-planning, shuffle task scheduling), not data work.
  * Runs a representative query subset min-of-3 under session confs
  * passed as `k=v` args, so candidate confs are measured on the SAME
  * box minutes apart instead of argued about.
  *
  * NOT part of the driver contract — local tooling behind PERF.md.
  * `runMain graft.tools.TailProbe [k=v ...]` */
object TailProbe {
  // a spread of tail queries across families (cheap scans, windowed
  // ts, broadcast joins, small aggs) plus two mid-cost ones
  private val Subset = Seq(
    "rel_scan_filter", "rel_scalar_agg", "rel_region_revenue",
    "rel_top_customers", "rel_pivot", "ts_tvl", "ts_gotk",
    "ts_moving_avg", "ts_resample", "risk", "ev_hourly", "ev_funnel",
    "ev_retention", "text_tokens", "text_langid", "text_quality",
    "dedup_exact", "sim_topk", "mm_meta", "datamart_summary",
    "text_tfidf", "rel_ntile")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // `q:<name>` args override the default subset (targeted probes);
    // `k=v` args are session confs
    val qArgs = args.filter(_.startsWith("q:")).map(_.drop(2))
    args.filterNot(_.startsWith("q:")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      b = b.config(k, v)
    }
    val subset = if (qArgs.nonEmpty) qArgs.toSeq else Subset
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val qs = graft.SparkEntry.queries
    val results = subset.map { name =>
      val fn = qs(name)
      val reps = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case e: Throwable =>
          println(s"  $name FAILED: ${e.getMessage}"); e.printStackTrace(); -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> reps.min
    }
    results.foreach { case (k, v) => println(f"  $k%-24s $v%7.3f") }
    graft.ArtifactCache.buildLog.foreach { case (k, v) =>
      println(f"  [artifact] $k%-24s $v%7.2f") }
    println(f"TAILPROBE total=${results.map(_._2).sum}%.3f confs=${args.mkString(",")}")
    spark.stop()
  }
}
