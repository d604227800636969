package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup outside the timed region: JVM/codegen/classloading and the
    // parquet footer reads, so the first timed query isn't charged for
    // session bring-up.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Three timed repetitions, report the min: the first execution of
      // a plan pays one-time Janino codegen compilation (~1-2 s) that
      // amortizes to zero in production, and any single rep can land on
      // transient background load — min-of-3 measures the steady-state
      // cost. The per-rep times are emitted under "reps" so a
      // contaminated run is visible post-hoc (a rep spread ≫ the min
      // means machine noise, not a plan regression). Caches are cleared
      // per rep so no rep benefits from a previous rep's persisted
      // intermediates.
      val reps = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> reps
    }
    // The driver captures a BOUNDED TAIL of stdout, so the summary line
    // carrying the verdict (total + per-query minimums) must come LAST;
    // the per-rep diagnostics line goes first and is expendable if
    // truncated. All times at 3 dp so neither line bloats.
    // Locale.ROOT: the f-interpolator uses the JVM default locale, and
    // a comma-decimal locale would print 6,340 — corrupting the JSON
    // the driver parses
    def dp3(d: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val repJson = results.map { case (k, v) =>
      s"\"" + k + "\":[" + v.map(dp3).mkString(",") + "]" }.mkString("{", ",", "}")
    println(s"""{"metric":"reps","unit":"sec","reps":$repJson,"sf":"$sfDir"}""")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + dp3(v.min) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2.min).sum else 0.0
    println(s"""{"metric":"total","value":${dp3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // Contamination evidence that SURVIVES tail truncation: the full
    // "reps" line above is 2x the summary's size and is the first to
    // be cut, which round 4 proved loses exactly the arbitration data
    // when the machine was loaded. This compact line repeats the rep
    // triplets for only the 10 most expensive queries — the ones that
    // dominate the total — AFTER the summary, so any captured tail
    // that has the verdict also has its evidence (rep spread >> min
    // means machine noise, not a plan regression).
    val top10 = results.sortBy(-_._2.min).take(10).map { case (k, v) =>
      s"\"" + k + "\":[" + v.map(dp3).mkString(",") + "]" }.mkString("{", ",", "}")
    println(s"""{"metric":"top10_reps","unit":"sec","reps":$top10}""")
    spark.stop()
  }
}
