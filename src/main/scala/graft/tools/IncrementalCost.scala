package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure incremental dedup cost vs full recompute — the PERF.md
  * evidence behind `Dedup.incrementalClusters`' claim that a release
  * increment costs the DELTA, not the corpus. Splits the corpus by
  * doc_id percentile into vN (100−pct %) and delta (pct %), builds the
  * vN state, times `incrementState` against a timed full-corpus
  * `buildState`, and checks the two decisions are row-identical.
  * NOT part of the driver contract — local tooling.
  * `runMain graft.tools.IncrementalCost <sfDir> [pct]` */
object IncrementalCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pct = args.lift(1).map(_.toInt).getOrElse(10)
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
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // arg 3: duplication factor — ×100 exact-dup density is the
    // regime where the mapping IS the corpus and the round-13 delta
    // append vs the remaining whole-write floors (keeper bands,
    // composed decision) actually separate; run with GRAFT_DEBUG=1
    // for the per-write lap breakdown inside incrementState
    val factor = args.lift(2).map(_.toInt).getOrElse(1)
    val base = graft.Tables.documents(spark, sfDir)
    val docs = if (factor <= 1) base else {
      val off = base.agg(max("doc_id")).head().getLong(0) + 1L
      val out = java.nio.file.Files
        .createTempDirectory("graft_incr_xcorpus").toString + "/documents.parquet"
      (0 until factor).map(c =>
          base.withColumn("doc_id", col("doc_id") + lit(c * off)))
        .reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
    }
    // pct mode: delta = pct% of the corpus by id hash — includes LOW
    // ids, which evict capped bucket members and force cold restarts
    // (the adversarial regime). abs mode (pct < 0): delta = the |pct|
    // HIGHEST doc_ids — the realistic release regime (new docs get
    // fresh ids above the prior corpus, so the lowest-k bucket cap
    // never evicts), and a FIXED absolute size for the "incremental
    // cost stays flat while the corpus grows" probe.
    val isDelta =
      if (pct >= 0) col("doc_id") % 100 < pct
      else {
        val cut = docs.select("doc_id").orderBy(col("doc_id").desc)
          .limit(-pct).agg(min(col("doc_id"))).first().getLong(0)
        col("doc_id") >= cut
      }
    val vN = docs.where(!isDelta)
    val delta = docs.where(isDelta)
    println(s"corpus=${docs.count()} delta=${delta.count()} (arg=$pct)")
    val root = java.nio.file.Files.createTempDirectory("graft_incr_cost").toString
    // warm-up: pay JVM/codegen/scan costs outside the timed phases
    graft.pipelines.Curation.buildState(spark, delta, s"$root/warm")
    spark.catalog.clearCache()
    time("buildState vN")(graft.pipelines.Curation.buildState(spark, vN, s"$root/vn"))
    spark.catalog.clearCache()
    time(s"incrementState $pct%")(
      graft.pipelines.Curation.incrementState(spark, delta, s"$root/vn", s"$root/vn1"))
    spark.catalog.clearCache()
    time("buildState full")(graft.pipelines.Curation.buildState(spark, docs, s"$root/full"))
    val a = spark.read.parquet(s"$root/vn1/dedup_clusters")
    val b = spark.read.parquet(s"$root/full/dedup_clusters")
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"decision rows incr=${a.count()} full=${b.count()} diff=$diff")
    // same protocol for the DEFAULT (exact-first) composition: the
    // increment probes the landed keeper mapping, absorbs exact dups
    // as mapping rows, and runs the fuzzy increment on new-group
    // keepers only
    spark.catalog.clearCache()
    time("exactFirst vN")(
      graft.pipelines.Curation.buildStateExactFirst(spark, vN, s"$root/xvn"))
    spark.catalog.clearCache()
    // the pct >= 0 regime puts LOW ids in the delta, which can demote
    // a landed exact keeper — the documented contract refuse (rebuild
    // is the escape hatch); the abs (pct < 0, highest-ids) regime is
    // the realistic release shape and increments cleanly
    try {
      time(s"exactFirst increment $pct%")(
        graft.pipelines.Curation.incrementState(spark, delta, s"$root/xvn", s"$root/xvn1"))
      spark.catalog.clearCache()
      time("exactFirst full")(
        graft.pipelines.Curation.buildStateExactFirst(spark, docs, s"$root/xfull"))
      val xa = spark.read.parquet(s"$root/xvn1/dedup_clusters")
      val xb = spark.read.parquet(s"$root/xfull/dedup_clusters")
      val xdiff = xa.exceptAll(xb).count() + xb.exceptAll(xa).count()
      println(s"exact-first decision rows incr=${xa.count()} full=${xb.count()} diff=$xdiff")
    } catch {
      case e: IllegalArgumentException if e.getMessage != null &&
          e.getMessage.contains("keeper demotion") =>
        println(s"exact-first increment REFUSED (keeper demotion) — " +
          "expected under the low-id adversarial split; use pct < 0 for the release regime")
    }
    spark.stop()
  }
}
