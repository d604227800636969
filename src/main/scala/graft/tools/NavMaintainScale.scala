package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipelines.NavIndex

/** The ×100 measurement of the navigable-graph MAINTENANCE paths —
  * the round-11 verdict's "asserted, not measured" gap: does
  * `NavIndex.incrementState` cost scale with the change frontier
  * (not the corpus) at the scale where the full build costs minutes,
  * and what does a micro-batch of `IndexStreams.navMaintainGate`
  * cost across an arrival sequence, including the width-boundary
  * rebuild fallback?
  *
  * Protocol, on the planted-mixture corpus (`RetrievalScale.mixture`
  * — the clustered regime the round-11 recall work validated):
  *
  *   1. ×100 (200k vectors): time the FULL build (the baseline the
  *      increment competes with), then for deltas of ~1% and ~10%
  *      (highest ids — the realistic release regime): build the vN
  *      state, time `incrementState`, and assert the incremented
  *      graph is ROW-IDENTICAL to the full build's graph over the
  *      same corpus (the PipelineSpec parity proof, re-run at the
  *      scale that matters).
  *   2. ×10 arrival sequence (14k + 3×2k): drive
  *      `IndexStreams.maintainBatch` batch-by-batch (the foreachBatch
  *      body — deterministically equivalent to the stream, whose
  *      replay contract is already unit-specced) and record per-batch
  *      cost. The last batch crosses `navBitsFor`'s 18k→20k seed-band
  *      width boundary, so it exercises the REBUILD fallback — the
  *      one arrival an increment cannot honor.
  *
  * NOT part of the driver contract — local tooling behind PERF.md.
  * `runMain graft.tools.NavMaintainScale [outBase]` */
object NavMaintainScale {
  def main(args: Array[String]): Unit = {
    val outBase = args.headOption.getOrElse("/tmp/graft_nav_maint")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def assertGraphParity(rootA: String, rootB: String): Unit = {
      val a = NavIndex.graph(spark, rootA)
      val b = NavIndex.graph(spark, rootB)
      val extra = a.exceptAll(b).count(); val missing = b.exceptAll(a).count()
      println(s"  graph parity vs full rebuild: " +
        (if (extra == 0 && missing == 0) s"IDENTICAL (${a.count()} edges)"
         else s"DIVERGED (+$extra -$missing)"))
    }

    // ---- 1. x100 increments vs the full build ----
    val n = 200000L
    val dir = s"$outBase/mix100"
    RetrievalScale.mixture(spark, n)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val fullRoot = s"$outBase/idx_full"
    time(s"x100 FULL build (${n} vecs)")(
      NavIndex.buildState(spark, emb, fullRoot))
    for (pct <- Seq(1, 10)) {
      val cut = n * (100 - pct) / 100
      val vN = emb.where(col("vec_id") < cut)
      val delta = emb.where(col("vec_id") >= cut)
      val rootA = s"$outBase/idx_vn$pct"
      val rootB = s"$outBase/idx_vn${pct}n"
      time(s"x100 build vN ($cut vecs, $pct% held out, UNIFORM)")(
        NavIndex.buildState(spark, vN, rootA))
      println(f"  est. seed-frontier fraction (routing signal): " +
        f"${NavIndex.seedFrontierFraction(spark, delta, rootA)}%.3f")
      time(s"x100 incrementState (+${n - cut} vecs, $pct% uniform)")(
        NavIndex.incrementState(spark, delta, rootA, rootB))
      assertGraphParity(rootB, fullRoot)
      spark.catalog.clearCache()
    }
    // LOCALIZED delta — the "new content domain arrives" release
    // regime: hold out ONE mid-mass planted cluster (~0.7% of the
    // corpus), so the delta's neighborhoods — and therefore the TRUE
    // change frontier — are confined. The uniform legs above are the
    // adversarial bound (a delta hashed into every cluster perturbs
    // every neighborhood, so the exact frontier IS the corpus and a
    // rebuild is the honest recommendation there).
    {
      val delta = emb.where(col("label") === 32)
      val vN = emb.where(col("label") =!= 32)
      val nd = delta.count()
      val rootA = s"$outBase/idx_vncl"
      val rootB = s"$outBase/idx_vncln"
      time(s"x100 build vN (${n - nd} vecs, cluster 32 held out)")(
        NavIndex.buildState(spark, vN, rootA))
      println(f"  est. seed-frontier fraction (routing signal): " +
        f"${NavIndex.seedFrontierFraction(spark, delta, rootA)}%.3f")
      time(s"x100 incrementState (+$nd vecs, LOCALIZED)")(
        NavIndex.incrementState(spark, delta, rootA, rootB))
      assertGraphParity(rootB, fullRoot)
      spark.catalog.clearCache()
    }

    // ---- 1b. x100 RETIRE (the deletion path Curation.retireDropped
    // drives): physically delete the same localized cluster from the
    // FULL index and compare against building the reduced corpus
    // from scratch — the dedup-decision-arrives-after-indexing
    // release shape.
    {
      val del = emb.where(col("label") === 32).select("vec_id")
      val nd = del.count()
      val rootR = s"$outBase/idx_ret"
      val refR = s"$outBase/idx_retref"
      time(s"x100 retireState (-$nd vecs, LOCALIZED)")(
        NavIndex.retireState(spark, del, fullRoot, rootR))
      time(s"x100 build of the reduced corpus (${n - nd} vecs)")(
        NavIndex.buildState(spark, emb.where(col("label") =!= 32), refR))
      assertGraphParity(rootR, refR)
      spark.catalog.clearCache()
    }

    // ---- 1c. x100 COMPACTION/ANCHORIFY lifecycle (round 14): a
    // localized-only arrival sequence appends one directory per batch
    // to its hot vector buckets and never lands an anchor, so before
    // compaction existed, vacuum refused forever and per-read dir
    // lists grew without bound. Measure: dir growth over ten
    // localized micro-batches, read cost pre/post compact, the
    // compact itself (pure I/O), vacuum reclaiming the chain, and
    // graph parity with the one-shot full build.
    {
      val delta = emb.where(col("label") === 32)
      val vN = emb.where(col("label") =!= 32)
      val rootC = s"$outBase/idx_chain"
      spark.conf.set("graft.nav.compactMaxDirs", s"${Int.MaxValue}") // explicit compact below
      time("x100 chain build vN (cluster 32 held out)")(
        graft.streaming.IndexStreams.maintainBatch(spark, vN, rootC, 0L))
      for (b <- 1 to 10) {
        val slice = delta.where(pmod(col("vec_id"), lit(10)) === lit(b - 1))
        val route = time(f"x100 chain batch $b (localized micro-slice)")(
          graft.streaming.IndexStreams.maintainBatch(spark, slice, rootC, b.toLong))
        if (route != "increment") println(s"  UNEXPECTED route: $route")
      }
      spark.conf.unset("graft.nav.compactMaxDirs")
      val tip = s"$rootC/v10"
      println(s"  pre-compact: maxDirs/bucket=${NavIndex.maxDirsPerBucket(spark, tip)} " +
        s"anchor=${NavIndex.isAnchor(spark, tip)}")
      time("x100 read graph+vecs (pre-compact)") {
        NavIndex.graph(spark, tip).count(); NavIndex.readVecs(spark, tip).count()
      }
      // round 17: the chain (anchor v0 + 10 splice-landed increments)
      // is reclaimed through the ChainRetention AUTO-COMPACT trigger —
      // one vacuum call self-compacts the tip (10 versions since the
      // newest anchor ≥ threshold 10) then deletes below it; no
      // explicit compact anywhere. This row is trigger-path compact +
      // vacuum together (r16 measured them split: 12.2 s + 1.0 s).
      spark.conf.set("graft.chain.autoCompactVersions", "10")
      time("x100 vacuum w/ auto-compact (anchorify tip + reclaim chain)")(
        graft.streaming.IndexStreams.vacuum(spark, rootC, 1))
      spark.conf.unset("graft.chain.autoCompactVersions")
      println(s"  post-vacuum: maxDirs/bucket=${NavIndex.maxDirsPerBucket(spark, tip)} " +
        s"anchor=${NavIndex.isAnchor(spark, tip)} versions=" +
        graft.streaming.IndexStreams.committedVersions(spark, rootC).mkString(","))
      time("x100 read graph+vecs (post-compact)") {
        NavIndex.graph(spark, tip).count(); NavIndex.readVecs(spark, tip).count()
      }
      assertGraphParity(tip, fullRoot)
      spark.catalog.clearCache()
    }

    // ---- 2. x10 arrival sequence through the maintenance gate ----
    val dir10 = s"$outBase/mix10"
    RetrievalScale.mixture(spark, 20000L)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir10/embeddings.parquet")
    val emb10 = spark.read.parquet(s"$dir10/embeddings.parquet")
    val root10 = s"$outBase/stream_idx"
    val cuts = Seq(0L -> 14000L, 14000L -> 16000L, 16000L -> 18000L, 18000L -> 20000L)
    cuts.zipWithIndex.foreach { case ((lo, hi), b) =>
      val batch = emb10.where(col("vec_id") >= lo && col("vec_id") < hi)
      val route = time(f"x10 batch $b (+${hi - lo} -> $hi vecs)")(
        graft.streaming.IndexStreams.maintainBatch(spark, batch, root10, b.toLong))
      println(s"  routed: $route")
      spark.catalog.clearCache()
    }
    // the sequence must land on the same graph as one full build
    val refRoot = s"$outBase/stream_ref"
    time("x10 reference full build (20000 vecs)")(
      NavIndex.buildState(spark, emb10, refRoot))
    val streamed = graft.streaming.IndexStreams.currentGraph(spark, root10)
    val ref = NavIndex.graph(spark, refRoot)
    println(s"x10 sequence-final parity vs one-shot build: " +
      (if (streamed.exceptAll(ref).count() == 0 && ref.exceptAll(streamed).count() == 0)
        s"IDENTICAL (${ref.count()} edges)" else "DIVERGED"))
    spark.stop()
  }
}
