package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.pipelines.{Curation, NavIndex}

/** The round-10 verdict's open measurement (#1a): does the SHIPPED
  * pipeline order — near-dup dedup BEFORE the serving-index build —
  * actually restore ×100 retrieval recall on the dup-cluster corpus
  * where indexing the raw corpus measured 0/30 (PERF.md round 10)?
  * Measure, don't assert.
  *
  * Three legs over the same generated ×N corpus (documents are EXACT
  * copies with shifted ids; embeddings get deterministic ±0.1 element
  * noise — the "same content re-embedded with jitter" regime that
  * fragments the navigable graph into per-cluster near-cliques):
  *
  *   raw       — index the raw corpus, walk, recall (the known collapse);
  *   lsh       — `Curation.buildState` (the shipped LSH near-dup chain)
  *               → kept doc ids → index ONLY kept vectors → recall.
  *               Prediction from the cap analysis: a duplicate clique
  *               WIDER than `Dedup.MaxBucket` (64) shares all 8 band
  *               keys, so cap-evicted members lose every bucket
  *               membership and leak through as unpaired singletons —
  *               the "deduped" corpus still holds ~37-member near-dup
  *               clusters and the index still fragments;
  *   exact+lsh — exact-dedup pre-pass (min doc_id per md5(text), the
  *               `dedup_exact` rule) → Curation on the exact keepers →
  *               index → recall. Exact dedup collapses cliques of ANY
  *               width in one content-hash shuffle, which is why
  *               production pipelines run exact BEFORE fuzzy.
  *
  * Recall for each leg is the walk top-3 against the exact brute force
  * over the SERVED (kept) corpus for the same 10 queries. NOT part of
  * the driver contract — local tooling behind PERF.md rows.
  * `runMain graft.tools.CurateThenIndex [srcDir] [outBase] [scales…]` */
object CurateThenIndex {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outBase = args.lift(1).getOrElse("/tmp/graft_curate_idx")
    val scales = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    for (scale <- scales) {
      val dir = s"$outBase/x$scale"
      time(s"gen x$scale dup corpus") {
        val emb = spark.read.parquet(s"$src/embeddings.parquet")
        (0 until scale).map { k =>
          emb.select(
            (col("vec_id") + lit(k * 10000000L)).as("vec_id"),
            (if (k == 0) col("embedding")
             else expr(s"transform(embedding, (x, i) -> " +
               s"cast(x + (hash(vec_id, $k, i) % 1000) / 10000.0d as float))"))
              .as("embedding"),
            col("label"))
        }.reduce(_.unionByName(_))
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
        val docs = spark.read.parquet(s"$src/documents.parquet")
        (0 until scale).map { k =>
          docs.withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
        }.reduce(_.unionByName(_))
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
      }
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val docs = spark.read.parquet(s"$dir/documents.parquet")

      // index an explicit corpus slice under `root`, walk the shipped
      // beam, report recall vs exact brute force over the same slice
      def walkRecall(leg: String, served: DataFrame, root: String): Unit = {
        val n = served.count()
        time(f"x$scale $leg index build ($n vecs)") {
          NavIndex.buildState(spark, served, root)
        }
        val base = NavIndex.readVecs(spark, root).persist()
        base.count()
        val q = base.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
        val edges = NavIndex.graph(spark, root)
        var walk: DataFrame = null
        var release: () => Unit = () => ()
        time(f"x$scale $leg walk (10 q)") {
          val r = Similarity.beamSearchReleasable(spark, base, q, edges)
          walk = r._1; release = r._2
          walk.count()
        }
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
        val hit = walk.select("qid", "nbr_id").join(bf3, Seq("qid", "nbr_id")).count()
        println(s"x$scale $leg recall: $hit/${bf3.count()}")
        bf3.unpersist(); release(); base.unpersist()
        spark.catalog.clearCache()
      }

      // kept doc ids under a landed Curation state: drop docs the
      // cluster decision marks keep=false; docs outside the decision
      // table (unpaired) are kept
      def keptIds(root: String): DataFrame =
        docs.select("doc_id").join(
          Curation.decision(spark, root)
            .where(!col("keep")).select("doc_id"),
          Seq("doc_id"), "left_anti")

      // ---- leg 1: RAW (the known collapse at x100) ----
      walkRecall("raw", emb, s"$dir/idx_raw")

      // ---- leg 2: the shipped LSH chain alone ----
      time(s"x$scale lsh Curation.buildState (${docs.count()} docs)") {
        Curation.buildState(spark, docs, s"$dir/cur_lsh")
      }
      val lshKeep = keptIds(s"$dir/cur_lsh").persist()
      println(s"x$scale lsh kept docs: ${lshKeep.count()} of ${docs.count()}")
      walkRecall("lsh-dedup", emb.join(
        lshKeep.withColumnRenamed("doc_id", "vec_id"), "vec_id"), s"$dir/idx_lsh")
      lshKeep.unpersist()

      // ---- leg 3: exact pre-pass, then the same LSH chain ----
      val exactKeepers = docs
        .groupBy(md5(col("text")).as("_h")).agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val docsX = docs.join(exactKeepers, "doc_id")
      time(s"x$scale exact+lsh Curation.buildState (${docsX.count()} docs)") {
        Curation.buildState(spark, docsX, s"$dir/cur_ex")
      }
      val exKeep = docsX.select("doc_id").join(
        Curation.decision(spark, s"$dir/cur_ex")
          .where(!col("keep")).select("doc_id"),
        Seq("doc_id"), "left_anti").persist()
      println(s"x$scale exact+lsh kept docs: ${exKeep.count()} of ${docs.count()}")
      walkRecall("exact+lsh-dedup", emb.join(
        exKeep.withColumnRenamed("doc_id", "vec_id"), "vec_id"), s"$dir/idx_ex")
      exKeep.unpersist()
    }
    spark.stop()
  }
}
