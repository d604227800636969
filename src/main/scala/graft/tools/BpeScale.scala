package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Text

/** BPE deep-vocabulary scaling measurement behind PERF.md's rows:
  * trains `Text.bpeTrainLoop` to a realistic merge count (default
  * 1000) and measures, per corpus scale,
  *
  *   - TRAIN time (the once-per-release tokenizer cost) — the claim
  *     under test: after the one vocab aggregate, per-round cost is
  *     O(vocabulary), so ×10/×100 corpus copies move train time by
  *     the vocab-aggregate term only;
  *   - merge-list BIT-IDENTITY across scales (training is weighted by
  *     occurrence counts, so uniform duplication cannot change any
  *     election — the `QclfScale` duplication-invariance discipline);
  *   - ENCODE time over the full corpus under the deep merge list
  *     (`Text.bpeEncodeWith`, the per-partition greedy scan);
  *   - the per-language FERTILITY SHIFT from the 5-merge oracle
  *     vocabulary to the deep one — the number a tokenizer evaluation
  *     actually reads.
  *
  * NOT part of the driver contract — local tooling.
  * `runMain graft.tools.BpeScale [srcDir] [k] [scales…]` */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(1000)
    val scales = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(1, 10, 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outBase = "/tmp/graft_bpe_scale"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    var mergesX1: Seq[(Long, String, String, Long)] = Seq.empty
    for (scale <- scales) {
      val dir =
        if (scale == 1) src
        else {
          val out = s"$outBase/x$scale"
          val docs = spark.read.parquet(s"$src/documents.parquet")
          // copy offset derived from the source's own id range — a
          // fixed constant would collide ids across copies on a
          // corpus whose doc_id already exceeds it and silently
          // distort the duplication-invariance check
          val off = docs.agg(max("doc_id")).head.getLong(0) + 1L
          (0 until scale).map { c =>
            docs.withColumn("doc_id", col("doc_id") + lit(c * off))
          }.reduce(_.unionByName(_))
            .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
          out
        }
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      println(s"== scale x$scale (${docs.count()} docs) ==")
      val trained = time(s"x$scale train $k merges")(
        Text.bpeTrainLoop(spark, docs, k))
      val rows = trained.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      println(s"x$scale learned merges: ${rows.length}")
      if (scale == 1) mergesX1 = rows
      else if (mergesX1.isEmpty)
        println(s"x$scale invariance SKIPPED (no x1 baseline in this run)")
      else {
        // duplication invariance: elections identical, counts ×scale
        val ok = rows.length == mergesX1.length && rows.zip(mergesX1).forall {
          case ((r1, a1, b1, n1), (r0, a0, b0, n0)) =>
            r1 == r0 && a1 == a0 && b1 == b0 && n1 == n0 * scale
        }
        println(s"x$scale merge-list invariance vs x1: " +
          (if (ok) "IDENTICAL (counts x" + scale + ")" else "DIVERGED"))
      }
      val ms = rows.map(r => (r._2, r._3))
      time(s"x$scale encode corpus ($k merges)")(
        Text.bpeEncodeWith(spark, docs, ms).count())
      if (scale == 1) {
        println("-- fertility shift (5-merge oracle vocab vs deep vocab) --")
        Text.bpeFertility(spark, dir).show(10, false)
        Text.bpeFertilityWith(spark, dir, ms).show(10, false)
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
