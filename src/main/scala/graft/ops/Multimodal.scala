package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing for training-data pipelines: media
  * payloads ride as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs as a partition-batched typed map.
  *
  * The container has no image/audio codecs, so `decodeBytes` is a
  * clearly-marked deterministic STUB (it "parses" header bytes); the
  * Spark-side plumbing — binary column handling, case-class schema,
  * `mapPartitions` batching, post-decode relational ops — is real and
  * is exactly what a production decoder (JNI codec, ONNX feature
  * extractor) would plug into.
  *
  * Scale notes: decode is a map-only stage; partition size is governed
  * by `maxPartitionBytes` against payload size, not row count. Keeping
  * payloads in a separate column lets Parquet column pruning skip the
  * bytes entirely for metadata-only queries (see `mediaMeta`, which
  * never materializes the payload).
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte])
  case class DecodedMedia(doc_id: Long, width: Int, height: Int,
                          sum_bytes: Long, mean_byte: Double)

  /** documents + synthesized payload column (md5-derived bytes — the
    * testdata ships no real media; deterministic by construction). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), unhex(md5(col("text"))).as("payload"))

  /** STUB decoder: a real implementation would hand `r.payload` to an
    * image/audio library here. This one derives dimensions from the
    * first two bytes and averages the rest — deterministic, so tests
    * can golden it. */
  private def decodeBytes(r: MediaRecord): DecodedMedia = {
    val b = r.payload
    val width = 1 + (b(0) & 0x0f)
    val height = 1 + (b(1) & 0x0f)
    // sum_bytes kept as an exact integer alongside the double mean so
    // downstream group averages can divide once (order-free, hence
    // bit-identical to the SQL oracle's integer-sum formulation).
    val sum = b.drop(2).map(x => (x & 0xff).toLong).sum
    DecodedMedia(r.doc_id, width, height, sum, sum.toDouble / (b.length - 2))
  }

  /** Partition-batched decode: one `decodeBytes` per record, amortized
    * per-partition setup (a real codec would init once per partition
    * here, before the iterator map). */
  def decode(spark: SparkSession, dir: String): Dataset[DecodedMedia] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord]
      .mapPartitions { it =>
        // per-partition decoder init would go here
        it.map(decodeBytes)
      }
  }

  /** Decode + aggregate by synthetic dimensions. Oracle-checked: the
    * stub decode is a pure function of md5(text) bytes, so DuckDB can
    * reproduce it from hex substrings; the average is computed from the
    * exact integer byte sums (one division at the end) so the group
    * aggregate is order-free and bit-identical across engines. */
  def decodeSummary(spark: SparkSession, dir: String): DataFrame =
    decode(spark, dir)
      .groupBy(col("width"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("sum_bytes")).cast("double") / (lit(14.0) * count(lit(1))), 6)
          .as("avg_mean_byte"))
      .orderBy("width")

  case class Frame(doc_id: Long, frame_idx: Int, frame_sum: Long)

  /** Frame sampling — the video-shaped plumbing: the payload is
    * treated as 4 fixed-size frames and every 2nd frame is decoded
    * (stub: byte sum per frame). One input row fans out to K sampled
    * frames via a typed flatMap — exactly where a real container
    * parser (per-partition codec init, keyframe seek) would plug in;
    * the fan-out shape, not the stub codec, is what carries to 100 TB
    * (frame rows inherit the input partitioning, no shuffle).
    * Output: doc_id, frame_idx, frame_sum. */
  def sampleFrames(spark: SparkSession, dir: String): Dataset[Frame] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord]
      .flatMap { r =>
        (0 until 4 by 2).map { f =>
          val frame = r.payload.slice(4 * f, 4 * f + 4)
          Frame(r.doc_id, f, frame.map(x => (x & 0xff).toLong).sum)
        }
      }
  }

  /** Driver-contract frame-sample query (oracle: byte sums from
    * md5(text) hex pairs, same derivation as `mmDecode`). */
  def frameSummary(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(spark, dir)
      .orderBy("doc_id", "frame_idx")
      .toDF()

  /** Metadata-only query — never touches payload bytes in the output
    * (oracle-checked): byte length + 2-hex-char format tag. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(unhex(md5(col("text")))).cast("bigint").as("n_bytes"),
        substring(md5(col("text")), 1, 2).as("fmt"))
      .orderBy("doc_id")

  /** 64-bit perceptual hash (aHash form) over the stub-decoded media:
    * an 8×8 "luminance grid" whose first 62 pixels derive from the
    * doc's VISUAL PREFIX (salted md5 chain over the 40-char prefix —
    * trailing-footer variants of the same image render the same
    * pixels) and whose last 2 pixels derive from the coarse payload
    * length bucket (n_chars div 64) — so a re-render with a slightly
    * different length lands at Hamming 1–2, not 0. Bit b is set iff
    * pixel_b exceeds the grid mean; the compare is exact-integer
    * (px·64 > Σpx), never a float mean, so both engines emit identical
    * signatures. A production pipeline swaps the stub grid for a real
    * decode + downsample (the DCT step of full pHash slots in the
    * same place); everything downstream — banding, verify, clustering
    * — is unchanged.
    *
    * Columns: doc_id, sig64 (64-char '0'/'1'), hi/lo packed BIGINTs. */
  private[graft] def phash64Table(spark: SparkSession, dir: String): DataFrame = {
    val pfx = substring(col("text"), 1, 40)
    // 62 prefix-derived pixels (4 salted digests = 64 bytes, last 2
    // unused) + 2 length-bucket pixels
    val hx = concat((0 until 4).map(j => md5(concat(lit(s"p$j|"), pfx))): _*)
    val lh = md5(concat(lit("L|"), expr("cast(n_chars div 64 as string)")))
    def pxAt(src: org.apache.spark.sql.Column, i: Int) =
      conv(substring(src, 2 * i + 1, 2), 16, 10).cast("int")
    val px = (0 until 62).map(pxAt(hx, _)) ++ (0 until 2).map(pxAt(lh, _))
    val s = px.reduce(_ + _)
    Tables.documents(spark, dir)
      .withColumn("_s", s)
      .select(col("doc_id"),
        concat(px.map(p => when(p * 64 > col("_s"), "1").otherwise("0")): _*).as("sig64"))
      .withColumn("hi", expr("cast(conv(substring(sig64, 1, 32), 2, 10) as bigint)"))
      .withColumn("lo", expr("cast(conv(substring(sig64, 33, 32), 2, 10) as bigint)"))
  }

  /** Published per-doc perceptual hash. Output: doc_id, phash. */
  def phash(spark: SparkSession, dir: String): DataFrame =
    phash64Table(spark, dir)
      .select(col("doc_id"), col("sig64").as("phash"))
      .orderBy("doc_id")

  /** Multimodal near-dup pairing: ALL media pairs at pHash Hamming
    * distance ≤ 2 — the same EXACT pigeonhole construction as
    * `Dedup.simhashPairs` (64 bits in 22/21/21 pieces: any pair
    * within distance 2 agrees on ≥ 1 piece, so candidates come from a
    * banded equi-join — no cartesian, no false negatives) with the
    * same packed-long XOR + `bit_count` verify inside whole-stage
    * codegen. This makes multimodal a first-class DEDUP citizen: the
    * pair list feeds the identical component/keeper machinery as text
    * near-dup. Output: doc_a, doc_b, hamming. */
  def phashPairs(spark: SparkSession, dir: String): DataFrame =
    phashPairArtifact(spark, dir).orderBy("doc_a", "doc_b")

  /** The pHash near-dup pair table as a landed artifact — the media
    * dedup index, built once per corpus version and read by both the
    * pair query and the cluster/apply pass (`ArtifactCache`, same
    * posture as the text-side band/cluster artifacts). */
  private def phashPairArtifact(spark: SparkSession, dir: String): DataFrame =
    graft.ArtifactCache.tableReleasable(spark, "mm_phash_pairs", dir) {
      val sig = phash64Table(spark, dir).persist()
      sig.count() // materialize before the band + two join sides fan out
      val pieces = array(
        substring(col("sig64"), 1, 22),
        substring(col("sig64"), 23, 21),
        substring(col("sig64"), 44, 21))
      val bands = sig.select(col("doc_id"), posexplode(pieces).as(Seq("b", "key")))
      val pairs = Dedup.pairsFromBands(bands)
        .join(sig.select(col("doc_id").as("doc_a"), col("hi").as("hi_a"), col("lo").as("lo_a")), "doc_a")
        .join(sig.select(col("doc_id").as("doc_b"), col("hi").as("hi_b"), col("lo").as("lo_b")), "doc_b")
        .withColumn("hamming",
          expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)").cast("bigint"))
        .where(col("hamming") <= 2)
        .select("doc_a", "doc_b", "hamming")
      (pairs, () => { sig.unpersist(); () })
    }

  /** The deduplicated MEDIA corpus — pHash near-dup pairs fed through
    * the identical component/keeper machinery as text near-dup
    * (`Dedup.clustersFromPairs`, driver union-find tier included):
    * media in no pair survive as their own cluster, paired media
    * survive only as the min-id keeper. This closes the multimodal
    * loop: signature → banded pairing → clusters → applied decision,
    * all shared with the text path. Output: doc_id, cluster_id,
    * n_bytes (stub payload size, as in `mm_meta`). */
  def dedupApply(spark: SparkSession, dir: String): DataFrame = {
    val cl = graft.ArtifactCache.tableReleasable(spark, "mm_cluster_decision", dir) {
      val (df, h) =
        Dedup.clustersFromPairsReleasable(phashPairArtifact(spark, dir).select("doc_a", "doc_b"))
      (df, () => h.release())
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), length(unhex(md5(col("text")))).cast("bigint").as("n_bytes"))
      .join(cl.select("doc_id", "cluster_id", "keep"), Seq("doc_id"), "left")
      .where(coalesce(col("keep"), lit(true)))
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        col("n_bytes"))
      .orderBy("doc_id")
  }
}
