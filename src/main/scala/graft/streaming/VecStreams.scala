package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Similarity
import graft.pipelines.NavIndex

/** Streaming vector-search operators — the retrieval twin of
  * `DocStreams`' ingest gates: query vectors ARRIVE (a file stream of
  * embedding-format parquet) and are answered against the LANDED
  * `NavIndex` release (the navigable-graph artifact + its vector
  * table), the same state batch `sim_graph_search` walks.
  *
  * The beam walk is 4 ranked stages — iterative per-query top-k that
  * append-mode streaming cannot express as stream-static joins alone
  * (each hop is a window over the previous hop). So the gate runs
  * `foreachBatch`: every micro-batch of arriving queries runs the
  * IDENTICAL batch walk (`Similarity.beamSearchFrom`) against the
  * static index — the standard index-probe posture (micro-batch = a
  * batch of queries; the index is read-versioned, refreshed by
  * `NavIndex.incrementState` at release cadence, not per batch).
  * Per-query independence makes the stream answer equal the batch
  * answer for the same query set regardless of batching
  * (`StreamingSpec` asserts it). */
object VecStreams {

  /** Streaming file source over a directory of embedding parquet
    * drops, schema declared from an existing embeddings file (a
    * streaming read cannot infer). */
  def readQueries(spark: SparkSession, dir: String, schemaSource: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(schemaSource).schema)
      .parquet(dir)

  /** Answer one micro-batch of queries against the release under
    * `root`: top-3 graph-search neighbors per query.
    * Output: qid, nbr_id, cos, rank. */
  def searchBatch(spark: SparkSession, batch: DataFrame, root: String): DataFrame =
    searchBatchReleasable(spark, batch, root)._1

  /** `searchBatch` plus the walk's release handle — frees the final
    * beam stage's checkpoint blocks (superseded hops are freed inside
    * the walk). A streaming query has no between-queries runner sweep
    * (`graft.CachePolicy`), so the gate calls it per micro-batch after
    * the sink write for deterministic per-batch reclamation. */
  private def searchBatchReleasable(spark: SparkSession, batch: DataFrame,
      root: String): (DataFrame, () => Unit) = {
    val corpus = NavIndex.readVecs(spark, root).persist()
    corpus.count() // materialize before the beam fans out over it
    val q = Similarity.vecsOf(spark, batch)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
    val (out, release) = Similarity.beamSearchReleasable(spark, corpus, q,
      NavIndex.graph(spark, root))
    corpus.unpersist() // out's final stage is cached; safe to drop
    (out, release)
  }

  /** Filtered twin of [[searchBatch]]: metadata-filtered answers
    * against the same release — `elig` is a one-column (node) table
    * of eligible corpus ids (typically a documents-side predicate,
    * e.g. lang), resolved once per release like the index itself. The
    * STRATEGY follows the batch default's measurable three-tier rule
    * (`Similarity.filteredStrategyFor`, round 17): `exact` (broadcast
    * brute force over the eligible subset, recall 1.0) when the
    * eligible set fits the walk's frontier budget, `harvest`
    * (unfiltered navigation, eligible answers accumulated across
    * hops) when the frontier expects ≥ 3 eligible answers, else the
    * in-walk (ACORN-bridged eligible-only beam) — the gate serves the
    * same answers a user gets from the batch entry point instead of
    * being pinned to one strategy. Two count aggregates per
    * micro-batch decide it, deterministic in (release, elig); the
    * `graft.filtered.strategy` conf overrides the rule (operator
    * escape hatch, and how the spec pins the non-routed branches).
    * Output: qid, nbr_id, cos, rank. */
  def filteredSearchBatch(spark: SparkSession, batch: DataFrame, root: String,
      elig: DataFrame): DataFrame =
    filteredSearchBatchReleasable(spark, batch, root, elig)._1

  private def filteredSearchBatchReleasable(spark: SparkSession, batch: DataFrame,
      root: String, elig: DataFrame): (DataFrame, () => Unit) = {
    val corpus = NavIndex.readVecs(spark, root).persist()
    val n = corpus.count() // materialize before the beam fans out over it
    val q = Similarity.vecsOf(spark, batch)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
    val strategy = spark.conf.getOption("graft.filtered.strategy")
      .getOrElse(Similarity.filteredStrategyFor(n, elig.count()))
    require(Set("exact", "harvest", "inwalk")(strategy),
      s"graft.filtered.strategy must be exact|harvest|inwalk, got '$strategy'")
    val (out, release) = strategy match {
      case "exact" =>
        (Similarity.filteredExactFrom(spark, corpus, q, elig), () => ())
      case "harvest" =>
        Similarity.filteredHarvestReleasable(spark, corpus, q,
          NavIndex.graph(spark, root), elig)
      case _ =>
        Similarity.filteredBeamReleasable(spark, corpus, q,
          NavIndex.graph(spark, root), elig)
    }
    corpus.unpersist() // out's final stage is cached; safe to drop
    (out, release)
  }

  /** The running FILTERED gate — same idempotent per-batch sink
    * contract as [[searchGate]]. */
  def filteredSearchGate(spark: SparkSession, queries: DataFrame, root: String,
      elig: DataFrame, outPath: String, checkpoint: String): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (ans, release) = filteredSearchBatchReleasable(spark, batch, root, elig)
        try ans.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        finally release()
      }
      .start()

  /** The running gate: arriving query vectors → top-3 answers landed
    * as parquet under `outPath` (one `batch=<id>` subdirectory per
    * micro-batch). foreachBatch is AT-LEAST-ONCE: a failure between
    * the sink write and the checkpoint commit replays the batch, so a
    * plain append would land its rows twice. Writing each batch under
    * its batchId with OVERWRITE makes the replay idempotent — the
    * rerun replaces its own directory bit-for-bit. Readers scan
    * `outPath` as partitioned parquet; the synthetic `batch` column is
    * dropped before the write, so it surfaces only as the partition
    * key (answer schema unchanged plus the provenance column). */
  def searchGate(spark: SparkSession, queries: DataFrame, root: String,
      outPath: String, checkpoint: String): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (ans, release) = searchBatchReleasable(spark, batch, root)
        try ans.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        finally release()
      }
      .start()
}
