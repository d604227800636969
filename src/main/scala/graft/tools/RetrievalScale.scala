package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Retrieval-family scaling measurement behind PERF.md's ×1/×10/×100
  * rows: generates perturbed N× embedding corpora (copies get
  * deterministic ±0.1 element noise so band buckets SPREAD instead of
  * collapsing into the dedup-style exact-duplicate case the caps
  * would evict), then times, separately,
  *
  *   - the navigable-graph BUILD (the once-per-release index cost),
  *   - the flat beam WALK over the landed graph (the serving cost),
  *   - the PQ codes+codebook build, and
  *   - the ADC-scored PQ walk + exact rerank.
  *
  * The claim under test: build scales ~linearly with corpus size
  * (each NN-descent round is a banded equi-join + per-node top-k),
  * while the walk scales FAR sublinearly (Q×beam probe joins whose
  * corpus-side cost is a scan, not a pairwise product). NOT part of
  * the driver contract — local tooling.
  *
  * `srcDir = "mixture"` switches the generator to a PLANTED-MIXTURE
  * corpus — the round-10 verdict's ask #1b: both perturbed-copy
  * regimes are degenerate at ×100 (±0.1 noise → per-clique
  * fragmentation; ±0.5 noise → isotropic gaussians, the graph-ANN
  * worst case), while real embedding corpora are CLUSTERED with low
  * intrinsic dimension — the regime the graph-ANN literature
  * actually measures recall in. The planted mixture: K=64 centers,
  * heavy-tailed sizes (cluster = ⌊K^u⌋ so P(cluster j) ∝ 1/j), each
  * point = center + a 4-basis low-dimensional offset + tiny isotropic
  * noise, all hash-derived (deterministic). Constants were validated
  * in a numpy prototype before landing: intra-cluster cos ≈ 0.85,
  * cross-cluster cos ≈ 0 ± 0.13, ~100% of exact top-3 same-cluster,
  * largest cluster ~16% of the corpus — clustered but nowhere
  * near-duplicate (nearest-neighbor cos ~0.98, not 0.999+).
  * `runMain graft.tools.RetrievalScale [srcDir|mixture] [outBase] [scales…]` */
object RetrievalScale {

  /** Planted-mixture embedding table at `n` vectors (see object doc).
    * Element scale matches the testdata corpus (entries ~ ±0.125), so
    * every downstream ladder (navBitsFor seeds, PQ subspaces) sees
    * the geometry it was tuned for. */
  private[tools] def mixture(spark: SparkSession, n: Long): org.apache.spark.sql.DataFrame = {
    val K = 64; val dim = 64
    // uniform ±1 from a hash, exactly reproducible in any engine
    def u(seed: String) = s"((pmod(hash($seed), 2001) - 1000) / 1000.0d)"
    val cExpr = s"cast(floor(power($K, pmod(hash(vec_id, 7), 1000000) / 1000000.0d)) as int)"
    val terms = Seq(
      s"(${u("c, i, 11")} * 0.125d)") ++                  // cluster center
      (1 to 4).map(r =>                                    // low-dim offset
        s"((${u(s"vec_id, ${r * 10}")} * 0.37d) * (${u(s"c, $r, i")} * 0.125d))") ++
      Seq(s"(${u("vec_id, i, 99")} * 0.01d)")              // isotropic jitter
    val embExpr =
      s"transform(sequence(0, ${dim - 1}), i -> cast(${terms.mkString(" + ")} as float))"
    spark.range(n).select(col("id").as("vec_id"))
      .withColumn("c", expr(cExpr))
      .select(col("vec_id"), expr(embExpr).as("embedding"), col("c").as("label"))
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outBase = args.lift(1).getOrElse("/tmp/graft_retr_scale")
    val scales = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(1, 10, 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    def gen(scale: Int): String =
      if (src == "mixture") {
        val out = s"$outBase/mix$scale"
        mixture(spark, 2000L * scale)
          .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
        // minimal documents side so the FILTERED walk runs in the
        // clustered regime too (round 16): hash-derived lang at the
        // testdata's ~1/5 'de' selectivity — eligibleIds reads only
        // (doc_id, lang)
        mixture(spark, 2000L * scale).select(
            col("vec_id").as("doc_id"),
            expr("array('de','en','es','fr','zh')[pmod(hash(vec_id, 31), 5)]").as("lang"))
          .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
        out
      } else if (scale == 1) src
      else {
        val out = s"$outBase/x$scale"
        val emb = spark.read.parquet(s"$src/embeddings.parquet")
        (0 until scale).map { k =>
          emb.select(
            (col("vec_id") + lit(k * 10000000L)).as("vec_id"),
            // ±0.5 noise ≫ the element scale (σ ≈ 0.125): copies must
            // be genuinely DISTINCT vectors. With near-duplicate
            // copies (±0.1 noise) the navigable graph fragments into
            // per-copy-cluster near-cliques — every node's top-16 is
            // its own 99 twins — and cross-cluster navigation is
            // impossible (measured: 0/30 recall at ×100 regardless of
            // hops). That is the real reason production pipelines
            // run near-dup DEDUP before building a serving index
            // (pipelines.Curation before pipelines.AnnIndex here).
            (if (k == 0) col("embedding")
             else expr(s"transform(embedding, (x, i) -> " +
               s"cast(x + (hash(vec_id, $k, i) % 1000) / 2000.0d as float))"))
              .as("embedding"),
            col("label"))
        }.reduce(_.unionByName(_))
          .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
        // metadata side for the filtered walk: same id shift, lang kept
        val docs = spark.read.parquet(s"$src/documents.parquet")
        (0 until scale).map { k =>
          docs.withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
        }.reduce(_.unionByName(_))
          .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
        out
      }

    for (scale <- scales) {
      val dir = gen(scale)
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      println(s"== scale x$scale ($n vectors) ==")
      time(s"x$scale graph build")(Similarity.navGraphShared(spark, dir).count())
      // walk over the landed graph — the serving-path cost
      val base = Similarity.vecsOf(spark, graft.Tables.embeddings(spark, dir))
        .select("vec_id", "v", "norm").persist()
      base.count()
      val q = base.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
      val edges = Similarity.navGraphShared(spark, dir)
      // time construction + count together: the hop loop runs its
      // persist/count jobs EAGERLY at construction, so timing only the
      // final count would measure a cache read, not the walk
      var walk: org.apache.spark.sql.DataFrame = null
      var release: () => Unit = () => ()
      time(s"x$scale flat walk (10 q)") {
        val r = Similarity.beamSearchReleasable(spark, base, q, edges)
        walk = r._1; release = r._2
        walk.count()
      }
      // RECALL at scale — speed without answers is worthless: exact
      // brute-force top-3 for the 10 queries (one corpus scan × 10,
      // cheap at any scale because the query set is bounded)
      val d = graft.functions.VectorFunctions.dot(spark, col("qv"), col("nv"))
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cos").desc, col("node"))
      val bf3 = base.select(col("vec_id").as("node"),
          col("v").as("nv"), col("norm").as("nnorm"))
        .join(broadcast(q), col("node") =!= col("qid"))
        .withColumn("cos", round(d / (col("qnorm") * col("nnorm")), 6))
        .withColumn("rk", row_number().over(wb))
        .where(col("rk") <= 3)
        .select(col("qid"), col("node").as("nbr_id")).persist()
      bf3.count()
      println(f"x$scale flat walk recall: " +
        s"${walk.select("qid", "nbr_id").join(bf3, Seq("qid", "nbr_id")).count()}/${bf3.count()}")
      release(); base.unpersist()
      time(s"x$scale pq codes+codebook build")(
        Similarity.pqSearchCodesArt(spark, dir).count() +
          Similarity.pqSearchCodebookArt(spark, dir).count())
      var pq: org.apache.spark.sql.DataFrame = null
      var pqRelease: () => Unit = () => ()
      time(s"x$scale pq walk+rerank (10 q)") {
        val r = Similarity.pqSearchDerive(spark, dir)
        pq = r._1; pqRelease = r._2
        pq.count()
      }
      println(f"x$scale pq walk recall: " +
        s"${pq.select(col("vec_id").as("qid"), col("nbr_id"))
          .join(bf3, Seq("qid", "nbr_id")).count()}/${bf3.count()}")
      pqRelease()
      // SQ8 posture (third memory tier next to flat 256 B and PQ 16 B
      // per vector): 64 B/vector int8 codes, exact int64-dot MIPS
      // scan — no graph, so the serving cost IS the quantized scan
      time(s"x$scale sq8 codes build")(
        Similarity.sq8Codes(spark, dir).count())
      var sq: org.apache.spark.sql.DataFrame = null
      time(s"x$scale sq8 scan (10 q)") {
        sq = Similarity.sq8Search(spark, dir)
        sq.count()
      }
      println(f"x$scale sq8 recall: " +
        s"${sq.select(col("vec_id").as("qid"), col("nbr_id"))
          .join(bf3, Seq("qid", "nbr_id")).count()}/${bf3.count()}")
      // two-stage posture: int8 top-32 overfetch + exact fp32 rerank
      var sqr: org.apache.spark.sql.DataFrame = null
      time(s"x$scale sq8 rerank scan (10 q)") {
        sqr = Similarity.sq8Rerank(spark, dir)
        sqr.count()
      }
      println(f"x$scale sq8 rerank recall: " +
        s"${sqr.select(col("vec_id").as("qid"), col("nbr_id"))
          .join(bf3, Seq("qid", "nbr_id")).count()}/${bf3.count()}")
      bf3.unpersist()
      // filtered dual-strategy search: first touch builds the answers
      // artifact over the already-landed graph (both walks + filter).
      // The documents metadata side is real testdata here or the
      // hash-derived lang spine in mixture mode.
      time(s"x$scale filtered dual walk (10 q)")(
        Similarity.filteredSearch(spark, dir).count())
      // per-strategy recall floor vs the FILTERED brute-force top-3
      // (round 16: the sf0.1 floors — in-walk 30/30 vs overfetch
      // 25/30 — recorded at every scale, so recall-vs-scale is
      // measured, not asserted)
      Similarity.filteredRecall(spark, dir)
        .groupBy("strategy")
        .agg(sum(when(col("in_top3"), 1L).otherwise(0L)).as("hits"),
          count(lit(1)).as("n"))
        .orderBy("strategy")
        .collect()
        .foreach(r => println(s"x$scale filtered recall ${r.getString(0)}: " +
          s"${r.getLong(1)}/${r.getLong(2)}"))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
