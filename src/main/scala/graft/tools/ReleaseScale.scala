package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Release-path scaling measurement (PERF.md ×1/×10/×100 rows for
  * `Text.shardShuffleDocs` + `Text.budgetApplyDocs`): k exact copies
  * of the sf corpus (doc_ids offset per copy — md5 shuffle keys
  * spread, so shard widths stay uniform), timing each op end to end
  * and asserting its invariants AT SCALE:
  *
  *   - shard shuffle: a permutation (count == distinct == n), pos
  *     contiguous per shard (max == count), ladder-derived shard
  *     count. Expected ~linear: one md5 scan + one shard-keyed
  *     window whose per-task rows the ladder bounds.
  *   - budget apply: kept mass within the 25% budget globally, and
  *     within the water-filled per-source allocation. Expected
  *     ~linear: two corpus-sized shuffles (bucket window + source
  *     offsets) + broadcast joins.
  *
  * NOT part of the driver contract — local tooling.
  * `runMain graft.tools.ReleaseScale [sfDir] [factors…]` */
object ReleaseScale {
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
      .select(col("doc_id"), col("source"), col("text"))
    for (f <- factors) {
      val docs = base
        .select(col("doc_id"), col("source"), col("text"),
          explode(expr(s"sequence(0L, ${f - 1}L)")).as("cp"))
        .select((col("doc_id") + col("cp") * 100000000L).as("doc_id"),
          col("source"), col("text"))
        .repartition(cpus.toInt).persist()
      val n = docs.count()

      var t0 = System.nanoTime()
      val per = graft.ops.Text.shardShuffleDocs(spark, docs.select("doc_id"))
        .groupBy("shard")
        .agg(count(lit(1)).as("c"), max(col("pos")).as("m"),
          countDistinct(col("doc_id")).as("d"))
      val rows = per.collect()
      val tShard = (System.nanoTime() - t0) / 1e9
      val permOk = rows.map(_.getAs[Long]("c")).sum == n &&
        rows.map(_.getAs[Long]("d")).sum == n &&
        rows.forall(r => r.getAs[Long]("m") == r.getAs[Long]("c"))
      println(f"[relscale] x$f%-4d n=$n%9d shards=${rows.length}%5d " +
        f"shuffle=$tShard%8.2f s  perm=${if (permOk) "OK" else "BROKEN"}")

      t0 = System.nanoTime()
      val ch = graft.ops.Text.cdcChunksDocs(docs)
        .agg(count(lit(1)).as("nc"), sum(col("n_toks")).as("nt"))
        .first()
      val tCdc = (System.nanoTime() - t0) / 1e9
      println(f"[relscale] x$f%-4d cdc=$tCdc%8.2f s  " +
        f"chunks=${ch.getLong(0)}%9d toks=${ch.getLong(1)}%12d")

      t0 = System.nanoTime()
      val ba = graft.ops.Text.budgetApplyDocs(spark, docs).persist()
      val km = ba.where(col("kept")).agg(sum(col("n_toks"))).first().getLong(0)
      val tm = ba.agg(sum(col("n_toks"))).first().getLong(0)
      val tBudget = (System.nanoTime() - t0) / 1e9
      println(f"[relscale] x$f%-4d budget=$tBudget%8.2f s  " +
        f"kept=$km%12d of=$tm%12d  within=${if (km <= tm / 4) "OK" else "OVER"}")
      ba.unpersist(); docs.unpersist()
    }
    spark.stop()
  }
}
