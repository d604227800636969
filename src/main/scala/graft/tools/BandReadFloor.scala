package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipelines.NavIndex

/** Measure the WIDE-DELTA band-membership floor (round-14 verdict
  * ask #5): the increment's prior-membership probe reads the landed
  * band table partition-pruned to the delta's hash(b, key) buckets,
  * and a delta spanning > 64 distinct band keys covers (almost) all
  * 64 hash buckets by pigeonhole — the pruned read degenerates to the
  * full (narrow, 3-column) band table. Is that degenerate read
  * MATERIAL next to the splice work, at the ×100 scale where the
  * localized increment costs ~30 s?
  *
  * Protocol: land the ×100 (200k-vector) band state (vecs + bands +
  * bstats via `landVecs` — no graph build needed; the probe cost is a
  * pure read property of the landed layout), then time
  *   (a) the pruned read at 1-cluster delta coverage,
  *   (b) the full 64-bucket narrow read (the wide-delta degenerate),
  * and report per-delta band-key/bucket coverage for 1/2/4/8-cluster
  * deltas — how fast a delta actually walks into the degenerate case.
  *
  * NOT part of the driver contract — local tooling behind PERF.md.
  * `runMain graft.tools.BandReadFloor [outBase]` */
object BandReadFloor {
  def main(args: Array[String]): Unit = {
    val outBase = args.headOption.getOrElse("/tmp/graft_bandfloor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val n = 200000L
    RetrievalScale.mixture(spark, n)
      .write.mode(SaveMode.Overwrite).parquet(s"$outBase/embeddings.parquet")
    val emb = spark.read.parquet(s"$outBase/embeddings.parquet")
    val root = s"$outBase/state"
    time(s"x100 landVecs (vecs + band state, $n vecs)")(
      NavIndex.landVecs(spark, emb, root))

    // the probe's bucket arithmetic, from the engine itself
    val nPb = 1 << NavIndex.PartBits
    def bandPb(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("pb", NavIndex.bandPbOf(col("b"), col("key")))
    val bands = NavIndex.bands(spark, root)

    // per-delta band-space coverage: how many clusters until the
    // pruned probe degenerates to all 64 buckets
    for (k <- Seq(1, 2, 4, 8)) {
      // labels are 1-based: label <= k selects k whole clusters
      val ids = emb.where(col("label") <= k).select(col("vec_id"))
      val keys = bandPb(bands.join(ids, "vec_id"))
        .agg(countDistinct(struct(col("b"), col("key"))).as("keys"),
          countDistinct(col("pb")).as("pbs"), count(lit(1)).as("rows"))
        .first()
      println(s"  delta=$k clusters: distinct band keys=${keys.getLong(0)} " +
        s"touched hash buckets=${keys.getLong(1)}/$nPb member rows=${keys.getLong(2)}")
    }

    // (a) pruned read at 1-cluster coverage vs (b) the degenerate
    // full narrow read — both as count() over the same landed layout,
    // min-of-3 (first touch pays footer/codegen)
    // the genuinely-pruned case is a MICRO-SLICE delta (the chain
    // protocol's ~1/10-cluster batches); whole-cluster deltas already
    // span > 64 band keys and degenerate (see the coverage table)
    val pbs1 = bandPb(bands.join(
        emb.where(col("label") === 1 && pmod(col("vec_id"), lit(10)) === 0)
          .select(col("vec_id")), "vec_id"))
      .select("pb").distinct().collect().map(_.getInt(0)).toSet
    def minOf3(f: => Long): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min
    def readBands(pbs: Set[Int]) = graft.io.BucketedTable.readParts(spark,
      NavIndex.bandsPath(root), NavIndex.BandsSchema, pbs, NavIndex.BandScheme)
    val prunedSec = minOf3(readBands(pbs1).count())
    val fullSec = minOf3(readBands((0 until nPb).toSet).count())
    println(f"  pruned read (${pbs1.size} buckets, 1-cluster delta): $prunedSec%.2f s")
    println(f"  DEGENERATE full narrow read ($nPb buckets):            $fullSec%.2f s")
    println(f"  wide-delta floor = full - pruned = ${fullSec - prunedSec}%.2f s " +
      "(vs ~30 s localized x100 increment wall, PERF.md round 14)")
    spark.stop()
  }
}
