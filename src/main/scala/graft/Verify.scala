package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only = args.drop(2).toSet // optional query-name filter (local use)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same cached-plan-AQE posture as graft.Bench, so the hash gate
      // exercises the exact session the bench times
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // bounded-by-construction parity windows WARN once per plan —
    // suppressed here because PlanAuditSpec ASSERTS the inventory of
    // queries allowed an unpartitioned window (the warning's job)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // one knob governs the engine's deep-merge export AND the oracle's
    // read glob: the oracle text is rendered from the system property
    // (OracleSql is session-free), so mirror the spark-conf spelling
    // into it before any oracle string is built
    spark.conf.getOption("graft.bpe.deepMergesExportDir")
      .foreach(sys.props.update("graft.bpe.deepMergesExportDir", _))
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // several operators persist() intermediates for intra-query
      // fan-out; release them so caches don't accumulate across the
      // 60-query run (the runner-side contract the ops rely on)
      spark.catalog.clearCache()
    }
    // oracle precheck (round-15 ADVICE): DuckDB's read_parquet errors
    // on a no-match glob, so if the deep-merge export never landed
    // (fresh checkout with the deep queries filtered out of a partial
    // run, or a failed training) land it now — the oracle must reach
    // a verdict, not a bind error
    if (only.isEmpty || only("text_bpe_deep") || only("text_bpe_merge_audit")) {
      try graft.ops.Text.ensureDeepMergesExport(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] deep-merge export precheck failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
