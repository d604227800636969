package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Classifier-training scaling measurement (PERF.md ×1/×10/×100
  * rows for `Text.qclfTrain`): fits the hashed-logreg model on k
  * exact copies of the sf corpus (doc_ids offset per copy so every
  * row is distinct) and checks two things the 100 TB posture
  * depends on:
  *
  *   - TIME scales ~linearly in corpus size: each GD step is one
  *     broadcast join (64-row weight table) + two doc-keyed
  *     aggregations — no step touches anything super-linear.
  *   - The WEIGHTS are bit-identical across duplication factors.
  *     This is a THEOREM of the rounded dataflow, so any drift is a
  *     determinism bug: the gradient is a mean over documents —
  *     duplicating every doc k× scales the decimal gradient sum and
  *     the N carrier by exactly k, and the per-doc residuals/margins
  *     depend only on the (identical) weights — so every
  *     round(·, 6) sees the same argument at every step.
  *
  * NOT part of the driver contract — local tooling.
  * `runMain graft.tools.QclfScale [sfDir] [factors…]` */
object QclfScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 10, 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang")
    var ref: Map[Long, Double] = Map.empty
    for (f <- factors) {
      val docs = base
        .select(col("doc_id"), col("text"), col("lang"),
          explode(expr(s"sequence(0L, ${f - 1}L)")).as("cp"))
        .select((col("doc_id") + col("cp") * 100000000L).as("doc_id"),
          col("text"), col("lang"))
        // spread the copies over the worker threads: a 1-file source
        // exploded 100× otherwise funnels the feature scan through
        // the source file's few input splits
        .repartition(cpus.toInt)
      val t0 = System.nanoTime()
      val (w, release) = graft.ops.Text.qclfFit(spark, docs)
      val got = w.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val sec = (System.nanoTime() - t0) / 1e9
      release()
      val same = if (ref.isEmpty) { ref = got; "ref" }
        else if (got == ref) "IDENTICAL" else "DRIFT!"
      println(f"[qclfscale] x$f%-4d docs=${base.count() * f}%9d fit=$sec%8.2f s  weights=$same")
    }
    spark.stop()
  }
}
