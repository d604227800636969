package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming document-ingest operators — the streaming twins of
  * `graft.ops.Dedup`'s batch gates. A live corpus drop zone never
  * re-runs batch dedup over the whole corpus per arrival; it keeps
  * per-fingerprint keyed state and decides each document as it lands
  * (the micro-batch mirror of `Dedup.incrementalClusters`' probe-the-
  * materialized-state posture, at exact-hash granularity).
  */
object DocStreams {

  /** Streaming file source over a directory of document parquet
    * files (the drop zone). */
  def readDocuments(spark: SparkSession, docsDir: String, schemaSource: String): DataFrame = {
    val schema = spark.read.parquet(schemaSource).schema
    spark.readStream.schema(schema).parquet(docsDir)
  }

  case class DocIn(doc_id: Long, h: String)
  case class DedupDecision(doc_id: Long, h: String, keep: Boolean)

  /** Streaming exact-dedup gate — keep-first per content hash: the
    * first arrival of a fingerprint is kept, every later arrival is
    * flagged a duplicate. State is ONE long (the kept doc_id) per
    * distinct fingerprint, sharded by the groupBy key — the smallest
    * possible dedup state, and the reason this scales: a 100 TB
    * corpus holds state proportional to DISTINCT content, not
    * arrivals. Within a micro-batch, ties resolve by doc_id (the
    * batch builder's min-doc_id election), so when arrivals respect
    * doc_id order the decision stream is row-identical to
    * `Dedup.exact` — the parity `StreamingSpec` asserts. NoTimeout:
    * dedup state must outlive any gap (a duplicate can arrive months
    * later); production would swap in a TTL matched to the corpus
    * release cadence. */
  def dedupGate(spark: SparkSession, docs: DataFrame): Dataset[DedupDecision] = {
    import spark.implicits._

    def update(h: String, batch: Iterator[DocIn],
               state: GroupState[Long]): Iterator[DedupDecision] = {
      var kept = state.getOption.getOrElse(-1L)
      val out = batch.toSeq.sortBy(_.doc_id).map { d =>
        if (kept < 0) { kept = d.doc_id; DedupDecision(d.doc_id, h, keep = true) }
        else DedupDecision(d.doc_id, h, keep = false)
      }
      state.update(kept)
      out.iterator
    }

    docs.select(col("doc_id"), md5(col("text")).as("h")).as[DocIn]
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming MinHash NEAR-dup gate — the LSH companion to
    * `dedupGate`'s exact-hash gate: each arriving document derives its
    * 4 LSH band keys MAP-SIDE (`Dedup.mapSideBands` — no stateful
    * aggregate, so the query stays in append mode) and probes the
    * corpus' materialized bucket-capped band INDEX (the same landed
    * state `Curation.incrementState` probes in batch) by stream-static
    * equi-join on (b, key). A bucket collision is a near-dup candidate
    * pair; `dropDuplicates` collapses multi-band collisions of the
    * same pair (keyed state per distinct pair — production would bound
    * it with `dropDuplicatesWithinWatermark` at the release cadence).
    *
    * Against the index of its own corpus this reproduces the batch
    * `minhashCandidates` pair list exactly wherever the bucket cap
    * never fired (`StreamingSpec` asserts parity); an arriving doc cut
    * from a capped bucket in batch still flags here — the probe side
    * is uncapped by design, since a live gate must judge every
    * arrival. Output: doc_a, doc_b (candidate pair, doc_a < doc_b). */
  def nearDupGate(spark: SparkSession, docs: DataFrame, bandIndex: DataFrame): DataFrame =
    graft.ops.Dedup.mapSideBands(docs)
      .join(bandIndex.select(col("doc_id").as("partner"), col("b"), col("key")),
        Seq("b", "key"))
      .where(col("doc_id") =!= col("partner"))
      .select(least(col("doc_id"), col("partner")).as("doc_a"),
        greatest(col("doc_id"), col("partner")).as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")

  /** Streaming partial-copy gate: arriving docs winnow map-side
    * (`functions.WinnowSelect` is a pure projection, so the whole
    * fingerprint derivation is streaming-legal), and the selections
    * probe the LANDED fp index as a stream-static equi-join —
    * fingerprints held by > 8 index docs are dropped at gate setup,
    * the identical boilerplate cap as batch `Text.winnowOverlap`.
    * Emits fp-grain matches (doc_a, doc_b, fp), deduplicated; the
    * release decision layer counts ≥ 2 shared fps downstream — the
    * same two-stage shape as `nearDupGate` → cluster formation.
    * (A count here would be a streaming aggregation needing
    * update-mode sinks; fp-grain append keeps the gate composable.) */
  def partialCopyGate(spark: SparkSession, docs: DataFrame, fpIndex: DataFrame): DataFrame = {
    val idx = fpIndex.select(col("doc_id"), col("fp")).distinct()
    // cap is ≤ 8 only (not batch's 2..8): a singleton-index fp can
    // still legitimately pair with a NEW arrival that shares it — the
    // batch recompute including that arrival would count it at 2
    val capped = idx.join(
      idx.groupBy("fp").agg(count(lit(1)).as("nd"))
        .where(col("nd") <= 8).select("fp"),
      "fp") // static side: computed once at gate setup
    graft.ops.Text.winnowFrom(docs)
      .select(col("doc_id"), col("fp")).dropDuplicates("doc_id", "fp")
      .join(capped.select(col("doc_id").as("partner"), col("fp")), "fp")
      .where(col("doc_id") =!= col("partner"))
      .select(least(col("doc_id"), col("partner")).as("doc_a"),
        greatest(col("doc_id"), col("partner")).as("doc_b"), col("fp"))
      .dropDuplicates("doc_a", "doc_b", "fp")
  }

  /** Streaming CHUNK-level partial-copy gate — [[partialCopyGate]]'s
    * winnow fingerprints swapped for content-defined chunks: each
    * arriving document is chunked MAP-SIDE by the pure per-doc CDC
    * chunker (`Text.cdcChunksOf` — pinned row-identical to the batch
    * window dataflow, and windows are streaming-illegal anyway), and
    * its (sig, n_toks) chunk identities probe the corpus' landed
    * chunk index by stream-static equi-join. Chunk identities held by
    * > 8 index docs (boilerplate) are dropped at gate setup, the same
    * cap as the winnow gate. Because CDC chunks resynchronize after
    * edits, this catches a quoted or shifted passage inside an
    * otherwise-new arrival — the sub-document case the exact and
    * near-dup gates both miss. Output: doc_a, doc_b, sig, n_toks. */
  def cdcGate(spark: SparkSession, docs: DataFrame, chunkIndex: DataFrame): DataFrame = {
    import spark.implicits._
    val capped = chunkIndex.select("doc_id", "sig", "n_toks").join(
      chunkIndex.groupBy("sig", "n_toks")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .where(col("nd") <= 8).select("sig", "n_toks"),
      Seq("sig", "n_toks")) // static side: computed once at gate setup
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        graft.ops.Text.cdcChunksOf(text).map(c => (id, c._2, c._4)) }
      .toDF("doc_id", "n_toks", "sig")
      .dropDuplicates("doc_id", "n_toks", "sig")
      .join(capped.select(col("doc_id").as("partner"), col("sig"), col("n_toks")),
        Seq("sig", "n_toks"))
      .where(col("doc_id") =!= col("partner"))
      .select(least(col("doc_id"), col("partner")).as("doc_a"),
        greatest(col("doc_id"), col("partner")).as("doc_b"),
        col("sig"), col("n_toks"))
      .dropDuplicates("doc_a", "doc_b", "sig", "n_toks")
  }

  case class BudgetIn(source: String, doc_id: Long, n_toks: Long, k: String)
  case class BudgetDecision(source: String, doc_id: Long, n_toks: Long,
                            cum: Long, kept: Boolean)

  /** Streaming token-budget gate — the live half of
    * `Text.budgetApply`: each arriving document advances its source's
    * running token counter (keyed state: ONE long per source — the
    * smallest possible admission state) and is kept iff the counter
    * stays within the source's landed water-filled allocation
    * (`Text.budgetMix`, resolved once at gate setup like the
    * classifier weights). The counter advances whether or not the doc
    * is kept — exactly the batch rule, where `cum` is the
    * unconditional prefix sum. Within a micro-batch the group sorts
    * by the same (k, doc_id) shuffle key as batch, so when arrivals
    * respect k-order across batches the decision stream is
    * row-identical to `Text.budgetApply` (the [[dedupGate]]
    * contract; `StreamingSpec` asserts it with per-file triggers in
    * key order). NoTimeout: a budget holds for the release, not a
    * watermark window. */
  def budgetGate(spark: SparkSession, docs: DataFrame,
      allocs: DataFrame): Dataset[BudgetDecision] = {
    import spark.implicits._
    // dimension-sized (one row per source), resolved at gate setup
    val am = allocs.select(col("source"), col("alloc")).as[(String, Long)]
      .collect().toMap
    val bm = spark.sparkContext.broadcast(am)

    def update(src: String, batch: Iterator[BudgetIn],
               state: GroupState[Long]): Iterator[BudgetDecision] = {
      var cum = state.getOption.getOrElse(0L)
      // fail FAST on a source absent from the landed allocation table
      // (a new source appearing mid-release): getOrElse(0L) would
      // silently drop every arriving document with no signal — a
      // loud stream failure is the correct posture, exactly like the
      // width-boundary refuse on the index-maintenance path
      require(bm.value.contains(src),
        s"source '$src' has no allocation in the landed budget mix; " +
          "re-run Text.budgetMix over a corpus slice that includes it")
      val alloc = bm.value(src)
      val out = batch.toSeq.sortBy(r => (r.k, r.doc_id)).map { r =>
        cum += r.n_toks
        BudgetDecision(src, r.doc_id, r.n_toks, cum, cum <= alloc)
      }
      state.update(cum)
      out.iterator
    }

    docs.select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n_toks"),
        md5(concat(lit("shard-v1:"), col("doc_id").cast("string"))).as("k"))
      .as[BudgetIn]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming classifier-scoring gate: every arriving document is
    * scored against the LANDED trained model (`Text.qclfTrain`'s
    * 64-row weight table — resolved once per release, broadcast into
    * each micro-batch like the nav-index releases `VecStreams` probes).
    * The margin is a per-doc aggregation over exploded tokens —
    * a streaming agg append mode can't express — so the gate runs
    * `foreachBatch`: each micro-batch runs the IDENTICAL batch scoring
    * dataflow (`Text.qclfScoreDocs`); per-doc independence makes the
    * stream answer equal the batch answer for any batching
    * (`StreamingSpec` asserts it). Sink contract as [[VecStreams]]:
    * foreachBatch is at-least-once, so each batch lands under its
    * batchId subdirectory with overwrite — crash-replay replaces its
    * own directory instead of appending duplicates.
    * Output rows: doc_id, y, score, pred (+ `batch` partition key). */
  def qclfGate(spark: SparkSession, docs: DataFrame, wts: DataFrame,
      outPath: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Text.qclfScoreDocs(batch, wts)
          .select(col("doc_id"), col("y"), col("score"),
            (col("score") >= 0.5).cast("bigint").as("pred"))
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
      }
      .start()

  /** Streaming score-drift gate — the live half of `Text.qclfPsi`'s
    * drift monitor: each arriving micro-batch is scored against the
    * landed model and reduced MAP-SIDE to its 20-bin score histogram
    * (≤ 20 rows per batch — the gate ships bin counts, never scores,
    * so the monitor's cost is independent of arrival volume). Landed
    * under batchId subdirectories with overwrite (the house
    * at-least-once contract: crash-replay replaces its own directory).
    * Histogram sums are associative, so ANY batching of the same
    * arrivals lands the same total — the parity `StreamingSpec`
    * asserts against the batch PSI. */
  def driftGate(spark: SparkSession, docs: DataFrame, wts: DataFrame,
      outPath: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Text.qclfBinned(graft.ops.Text.qclfScoreDocs(batch, wts))
          .groupBy("bin").agg(count(lit(1)).as("n"))
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
      }
      .start()

  /** Drift readout over the landed gate output: sums the per-batch
    * histograms into the production window's bin counts and scores
    * them against the reference window through the SAME `psiTable`
    * core as the batch query — the live number and the batch number
    * cannot diverge by construction. `refBins`: bin, n_ref (e.g.
    * `Text.qclfRefBins`). Output: the `Text.qclfPsi` table. */
  def driftMonitor(spark: SparkSession, gateOut: String,
      refBins: DataFrame): DataFrame =
    graft.ops.Text.psiTable(spark, refBins,
      spark.read.parquet(gateOut)
        .groupBy("bin").agg(sum(col("n")).as("n_cur")))
}
