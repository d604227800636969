package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Writers
import graft.ops.Similarity

/** Incrementally-maintained ANN index — the embedding-side analog of
  * `Curation`'s dedup state chain: corpus release vN lands an index
  * (cell-bucketed vectors + the derived kNN graph), and release vN+1
  * costs the DELTA, not a from-scratch rebuild of the per-cell
  * self-join over the whole corpus.
  *
  * State per release root (all `Writers.truncateLoad`-landed, so a
  * re-run reproduces identical state):
  *   - `ann_widths`: per-label corpus counts — the input to the IVF
  *     re-tune ladder (`Similarity.bitsFor`);
  *   - `ann_cells`:  (vec_id, label, cell, v, norm) — the bucketed
  *     vectors, i.e. the index payload an IVF index stores per list;
  *   - `ann_graph`:  (vec_id, nbr_id, cos, rank) — the top-3 kNN
  *     edges every downstream graph pass (pagerank/labelProp/
  *     triangles/classify) consumes.
  *
  * The increment re-pairs ONLY touched cells: cells that receive a
  * delta vector, plus every cell of a label whose width crossed a
  * split tier (those labels re-cell wholly — the same widths would
  * re-derive in a full build, so cell ids must follow). Untouched
  * cells keep their prior edges verbatim; `pairCells` is
  * deterministic given membership, so the spliced graph is
  * row-identical to a full rebuild over vN ∪ delta
  * (`PipelineSpec` proves it, including across a tier crossing).
  *
  * Scale (100 TB): the touched-cell set is delta-proportional
  * (bounded by |delta| + members of tier-crossing labels — and a tier
  * crossing is itself amortized-rare: widths grow 8× between rungs).
  * The probe joins are hash equi-joins on cell against a broadcast of
  * the touched-cell ids; prior state is read, never recomputed.
  */
object AnnIndex {

  def widthsPath(root: String): String = s"$root/ann_widths"
  def cellsPath(root: String): String  = s"$root/ann_cells"
  def graphPath(root: String): String  = s"$root/ann_graph"

  /** The vN full build: assign cells from corpus-wide label widths,
    * land the three state tables. `emb` is an embeddings-format table
    * (vec_id, embedding, label). */
  def buildState(spark: SparkSession, emb: DataFrame, root: String): Unit = {
    val v0 = Similarity.vecsOf(spark, emb)
    Writers.truncateLoad(
      v0.groupBy("label").agg(count(lit(1)).as("cn")), widthsPath(root))
    val widths = spark.read.parquet(widthsPath(root))
    Writers.truncateLoad(
      Similarity.assignCells(v0, widths).select("vec_id", "label", "cell", "v", "norm"),
      cellsPath(root))
    val cells = spark.read.parquet(cellsPath(root)).persist()
    cells.count() // materialize before both self-join sides fan out
    Writers.truncateLoad(Similarity.pairCells(spark, cells), graphPath(root))
    cells.unpersist()
  }

  /** Release vN → vN+1: absorb `deltaEmb` (new vectors only; ids must
    * be disjoint from vN) against the state under `priorRoot`, land
    * the refreshed state under `nextRoot`. Only touched cells
    * re-pair; everything else is carried forward by read. */
  def incrementState(spark: SparkSession, deltaEmb: DataFrame,
      priorRoot: String, nextRoot: String): Unit = {
    val priorW = spark.read.parquet(widthsPath(priorRoot))
    val priorC = spark.read.parquet(cellsPath(priorRoot))
    val priorG = spark.read.parquet(graphPath(priorRoot))
    val dv = Similarity.vecsOf(spark, deltaEmb)

    // vN+1 label widths = vN widths + delta counts (full outer: a
    // delta-only label is new, a delta-free label keeps its width)
    val nextW = priorW.select(col("label"), col("cn").as("old_cn"))
      .join(dv.groupBy("label").agg(count(lit(1)).as("dcn")), Seq("label"), "full")
      .select(col("label"),
        (coalesce(col("old_cn"), lit(0L)) + coalesce(col("dcn"), lit(0L))).as("cn"),
        coalesce(col("old_cn"), lit(0L)).as("old_cn"))
    Writers.truncateLoad(nextW.select("label", "cn"), widthsPath(nextRoot))
    val widths = spark.read.parquet(widthsPath(nextRoot))

    // a label whose width crossed a split tier re-cells wholly (its
    // members' cell ids change in a full build, so they change here)
    val rebuildLabels = nextW
      .where(Similarity.bitsFor(col("cn")) =!= Similarity.bitsFor(col("old_cn")))
      .select("label")
    // re-select the canonical column order: the label-keyed join moves
    // the key first, and state tables must keep a stable schema
    val keepPrior = priorC.join(broadcast(rebuildLabels), Seq("label"), "left_anti")
      .select("vec_id", "label", "cell", "v", "norm")
    val reassign = priorC.join(broadcast(rebuildLabels), Seq("label"), "left_semi")
      .select("vec_id", "label", "v", "norm")
      .unionByName(dv.select("vec_id", "label", "v", "norm"))
    val assigned = Similarity.assignCells(reassign, widths)
      .select("vec_id", "label", "cell", "v", "norm")
    Writers.truncateLoad(keepPrior.unionByName(assigned), cellsPath(nextRoot))

    // touched cells = cells holding any newly-(re)assigned member;
    // delta-proportional, so they broadcast
    val cells = spark.read.parquet(cellsPath(nextRoot)).persist()
    cells.count()
    val touched = assigned.select("cell").distinct()
    val touchedMembers = cells.join(broadcast(touched), "cell").persist()
    touchedMembers.count() // materialize before both self-join sides fan out
    val rebuiltEdges = Similarity.pairCells(spark, touchedMembers)
    val keptOwners = keepPrior.select("vec_id", "cell")
      .join(broadcast(touched), Seq("cell"), "left_anti")
      .select("vec_id")
    val keptEdges = priorG.join(keptOwners, "vec_id")
      .select("vec_id", "nbr_id", "cos", "rank")
    Writers.truncateLoad(keptEdges.unionByName(rebuiltEdges), graphPath(nextRoot))
    touchedMembers.unpersist(); cells.unpersist()
  }

  /** The landed kNN graph, ordered like `Similarity.knnGraph` — what
    * downstream graph passes read. */
  def graph(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(graphPath(root)).orderBy("vec_id", "rank")
}
