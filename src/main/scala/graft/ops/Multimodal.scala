package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing for training-data pipelines: media
  * payloads ride as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs as a partition-batched typed map.
  *
  * The payloads are REAL images: each document renders (at media-table
  * build time) to an 8×8 grayscale 24-bit BMP emitted by the
  * hand-written spec encoder ([[Bmp.encodeGray]]), and every consumer
  * decodes those bytes through `javax.imageio` — the PLATFORM codec,
  * not our encoder's inverse. The pixel CONTENT is a deterministic
  * function of the document (salted md5 chain over its 40-char visual
  * prefix + a length-bucket footer — the testdata ships no media), so
  * the DuckDB oracle derives the same pixels directly and the
  * cross-engine compare proves the full encode→container→decode round
  * trip: a flipped row order, wrong stride, or bad channel packing
  * anywhere shows up as a hash mismatch. `mm_meta`'s oracle goes
  * further and reconstructs the FILE BYTES hex-for-hex.
  *
  * Scale notes: render and decode are map-only stages; partition size
  * is governed by `maxPartitionBytes` against payload size, not row
  * count. Keeping payloads in a separate column lets Parquet column
  * pruning skip the bytes entirely for metadata-only queries.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte])
  case class DecodedMedia(doc_id: Long, width: Int, height: Int,
                          sum_rgb: Long, px00_rgb: Long)

  /** Image side length (8×8 grid = the aHash geometry, so the
    * perceptual hash reads the decoded grid directly). */
  private[graft] val Side = 8

  private def md5Bytes(s: String): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))

  /** The 64-pixel gray grid a document renders to: 62 pixels from 4
    * salted digests of the 40-char VISUAL PREFIX (trailing-footer
    * variants of the same image render the same pixels) + 2 pixels
    * from the coarse length bucket (n_chars div 64) — so a re-render
    * with slightly different length lands at pHash Hamming 1–2, not
    * 0. Same derivation as the oracle's `mmPhashCtes`. */
  private[graft] def grayPixels(text: String, nChars: Long): Array[Int] = {
    val prefix = text.take(40)
    val hx = Array.tabulate(4)(j => md5Bytes(s"p$j|" + prefix)).flatten
    val lh = md5Bytes("L|" + (nChars / 64).toString)
    Array.tabulate(Side * Side)(i =>
      if (i < 62) hx(i) & 0xff else lh(i - 62) & 0xff)
  }

  /** documents + rendered REAL-BMP payload column. The render is the
    * "media arrives" seam: a production pipeline reads payload bytes
    * from the lake instead; everything downstream only sees
    * (doc_id, payload) and decodes with the platform codec. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      // spread the synth+codec work: the single-row-group corpus scan
      // is one task, and every mm_* consumer inherits this map's
      // partitioning (explicit N — AQE would size a keyed coalesce on
      // the pre-encode text bytes, not the decoded pixel work)
      .repartition(Tables.shufflePartitions(spark), col("doc_id"))
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nc) =>
        MediaRecord(id, Bmp.encodeGray(grayPixels(text, nc), Side, Side)) }
      .toDF()
  }

  /** REAL decoder: `javax.imageio` parses the payload; stats come from
    * the decoded pixel grid (channel sums, so a real RGB source needs
    * no code change). */
  private def decodeBytes(r: MediaRecord): DecodedMedia = {
    val (w, h, px) = Bmp.decodeRgb(r.payload)
    var sum = 0L
    var i = 0
    while (i < px.length) { sum += Bmp.rgbSum(px(i)); i += 1 }
    DecodedMedia(r.doc_id, w, h, sum, Bmp.rgbSum(px(0)).toLong)
  }

  /** Partition-batched decode: one `decodeBytes` per record, amortized
    * per-partition setup (a JNI codec / ONNX extractor would init once
    * per partition here, before the iterator map). */
  def decode(spark: SparkSession, dir: String): Dataset[DecodedMedia] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord]
      .mapPartitions { it =>
        // per-partition decoder init would go here
        it.map(decodeBytes)
      }
  }

  /** Per-document decoded stats — oracle-checked end to end: DuckDB
    * derives the expected pixels straight from the md5 chain, Spark
    * gets them by round-tripping real BMP bytes through `javax.imageio`;
    * equality pins the codec path. `px00_rgb` (channel sum of pixel
    * (0,0)) catches row-order/stride bugs a global sum would hide; the
    * mean divides the exact integer sum once (order-free, so
    * bit-identical across engines). */
  def decodeSummary(spark: SparkSession, dir: String): DataFrame =
    decode(spark, dir)
      .withColumn("mean_rgb",
        round(col("sum_rgb").cast("double") / (lit(3.0) * col("width") * col("height")), 6))
      .select(col("doc_id"), col("width"), col("height"),
        col("sum_rgb"), col("mean_rgb"), col("px00_rgb"))
      .orderBy("doc_id")

  case class ResizedMedia(doc_id: Long, payload: Array[Byte], sum_rgb: Long)

  /** Decode → RESIZE → re-encode, the full image-transform roundtrip
    * at the codec boundary: the platform codec (`javax.imageio`)
    * parses each payload, a nearest-neighbor downsample halves it to
    * 4×4 (dst(y,x) ← src(2y,2x), the deterministic NN rule), and the
    * spec-exact encoder re-emits a real BMP whose bytes the oracle
    * reconstructs hex-for-hex from the md5 pixel chain — so the
    * cross-engine compare pins decode, sampling arithmetic, and the
    * re-encoded container all at once. Same `mapPartitions` map-only
    * shape as [[decode]]: per-record pure function, partition sizing
    * by payload bytes, nothing shuffles; a production resize swaps
    * the NN kernel for the codec library's scaler in the same map.
    * Output: doc_id, width, height, sum_rgb, payload_md5. */
  def resize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val half = Side / 2
    mediaTable(spark, dir).as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val (w, h, px) = Bmp.decodeRgb(r.payload)
          require(w == Side && h == Side, s"unexpected geometry ${w}x$h")
          val small = Array.tabulate(half * half) { i =>
            val y = i / half; val x = i % half
            px(2 * y * w + 2 * x) & 0xff // gray render: any channel byte
          }
          var s = 0L; small.foreach(v => s += 3L * v)
          ResizedMedia(r.doc_id, Bmp.encodeGray(small, half, half), s)
        }
      }
      .select(col("doc_id"),
        lit(half).as("width"), lit(half).as("height"), col("sum_rgb"),
        md5(hex(col("payload"))).as("payload_md5"))
      .orderBy("doc_id")
  }

  /** The upscale direction of [[resize]] — nearest-neighbor 8×8 →
    * 16×16 (dst(y,x) ← src(y÷2, x÷2), each source pixel replicated
    * into a 2×2 block), re-encoded and byte-pinned by the same
    * hex-for-hex oracle reconstruction. Same map-only shape.
    * Output: doc_id, width, height, sum_rgb, payload_md5. */
  def resizeUp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val twice = Side * 2
    mediaTable(spark, dir).as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val (w, h, px) = Bmp.decodeRgb(r.payload)
          require(w == Side && h == Side, s"unexpected geometry ${w}x$h")
          val big = Array.tabulate(twice * twice) { i =>
            val y = i / twice; val x = i % twice
            px((y / 2) * w + x / 2) & 0xff
          }
          var s = 0L; big.foreach(v => s += 3L * v)
          ResizedMedia(r.doc_id, Bmp.encodeGray(big, twice, twice), s)
        }
      }
      .select(col("doc_id"),
        lit(twice).as("width"), lit(twice).as("height"), col("sum_rgb"),
        md5(hex(col("payload"))).as("payload_md5"))
      .orderBy("doc_id")
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame_sum: Long)

  /** The "video" payload: a container of 4 concatenated 8×8 BMP
    * frames (frame f's pixels from salted digests `f<f>|p<j>|` over
    * the FULL text — frames are content, not prefix renders). */
  private[graft] def framePixels(text: String, f: Int): Array[Int] = {
    val hx = Array.tabulate(4)(j => md5Bytes(s"f$f|p$j|" + text)).flatten
    Array.tabulate(Side * Side)(i => hx(i) & 0xff)
  }

  def videoTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      // same spread as mediaTable: the frame consumers inherit this
      .repartition(Tables.shufflePartitions(spark), col("doc_id"))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        MediaRecord(id, Array.tabulate(4)(f =>
          Bmp.encodeGray(framePixels(text, f), Side, Side)).flatten) }
      .toDF()
  }

  /** Frame sampling — the video-shaped plumbing made real: the
    * container walk advances by each BMP's DECLARED file size (header
    * offset 2, little-endian — format-driven parsing, no fixed-stride
    * assumption), decodes every 2nd frame via the platform codec, and
    * fans one input row out to K sampled frames via a typed flatMap —
    * exactly where a production container parser (keyframe seek)
    * plugs in. The fan-out shape is what carries to 100 TB: frame
    * rows inherit the input partitioning, no shuffle.
    * Output: doc_id, frame_idx, frame_sum. */
  def sampleFrames(spark: SparkSession, dir: String): Dataset[Frame] = {
    import spark.implicits._
    videoTable(spark, dir).as[MediaRecord]
      .flatMap { r =>
        // container walk: collect each frame's [start, size) by reading
        // the BMP header's declared file size, then decode the sampled ones
        val offsets = frameOffsets(r.payload, r.doc_id)
        offsets.indices.by(2).map { f =>
          val start = offsets(f)
          val size = Bmp.u32le(r.payload, start + 2)
          val (_, _, px) = Bmp.decodeRgb(r.payload.slice(start, start + size))
          Frame(r.doc_id, f, px.map(p => Bmp.rgbSum(p).toLong).sum)
        }
      }
  }

  /** Frame start offsets by each frame's DECLARED file size. Every
    * declared size must cover at least the 54-byte BMP header — a
    * corrupt payload whose size field is 0 or negative would otherwise
    * spin the offset iterator forever (hanging the executor task
    * instead of failing it); corrupt media is a data defect and
    * THROWS, the same posture as `Bmp.decodeRgb`. */
  private[graft] def frameOffsets(payload: Array[Byte], docId: Long): Array[Int] =
    Iterator.iterate(0) { o =>
      val sz = Bmp.u32le(payload, o + 2)
      require(sz >= 54,
        s"corrupt container for doc $docId: frame at $o declares size $sz (< 54)")
      o + sz
    }.takeWhile(_ < payload.length).toArray

  /** Driver-contract frame-sample query (oracle: 3× the md5-derived
    * byte sums per sampled frame, same derivation as the render). */
  def frameSummary(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(spark, dir)
      .orderBy("doc_id", "frame_idx")
      .toDF()

  /** The audio payload: 64 signed 16-bit PCM samples derived from
    * salted digests over the FULL text (little-endian pairs — sample
    * i reads bytes 2i, 2i+1). */
  private[graft] def audioSamples(text: String): Array[Int] = {
    val b = Array.tabulate(8)(j => md5Bytes(s"a$j|" + text)).flatten
    Array.tabulate(Side * Side) { i =>
      val v = (b(2 * i) & 0xff) | ((b(2 * i + 1) & 0xff) << 8)
      if (v >= 32768) v - 65536 else v
    }
  }

  def audioTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      // NOT spread like mediaTable: javax.sound's provider lookup goes
      // through a synchronized JDK service registry, so 32 concurrent
      // decode tasks serialize on that lock and run ~30x the per-record
      // cost (measured 32×767 ms vs 1×450 ms for the same corpus); the
      // serial scan task is both faster and contention-free here. A
      // production deployment gets its parallelism across executor
      // JVMs, where the per-JVM registry lock doesn't compound.
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => MediaRecord(id, Wav.encodePcm16(audioSamples(text))) }
      .toDF()
  }

  case class DecodedAudio(doc_id: Long, n_samples: Int, sample_rate: Int,
                          sum_abs: Long, peak: Long)

  /** Audio decode through the THIRD platform codec of the family
    * (`javax.sound.sampled` after `javax.imageio` and the BMP
    * container walk): RIFF/WAVE parsing + PCM frame readout, stats
    * over the decoded signed samples. Oracle-checked like the image
    * path — DuckDB derives expected samples from the md5 chain
    * (little-endian signed-16 reconstruction), so equality pins the
    * WAV encode→decode round trip, including sign handling.
    * Output: doc_id, n_samples, sample_rate, sum_abs, peak. */
  def audioStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioTable(spark, dir).as[MediaRecord]
      .mapPartitions { it =>
        // per-partition decoder init would go here
        it.map { r =>
          val (rate, s) = Wav.decodePcm16(r.payload)
          DecodedAudio(r.doc_id, s.length, rate,
            s.map(x => math.abs(x).toLong).sum,
            s.map(x => math.abs(x).toLong).max)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  case class AudioFeatures(doc_id: Long, energy: Long, zcr: Long)

  /** Audio FEATURE extraction over the decoded PCM — the signal
    * features a speech/music gate filters on: total energy Σx²
    * (exact BIGINT: 64 samples × 2³⁰ max ≪ 2⁶³), zero-crossing
    * count (adjacent sign products < 0 — high for noise-like
    * signals, low for tonal ones), and RMS (the one float op: a
    * single IEEE sqrt of an exact integer ratio, rounded 6 dp).
    * Same real-codec posture as [[audioStats]]: the features are
    * computed from `javax.sound.sampled`'s decoded samples while the
    * oracle derives them from the md5 chain — equality pins decode +
    * feature arithmetic together. Map-only `mapPartitions`, nothing
    * shuffles. Output: doc_id, energy, zcr, rms. */
  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioTable(spark, dir).as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val (_, s) = Wav.decodePcm16(r.payload)
          var e = 0L; var z = 0L; var i = 0
          while (i < s.length) { e += s(i).toLong * s(i); i += 1 }
          i = 1
          while (i < s.length) { if (s(i - 1) * s(i) < 0) z += 1; i += 1 }
          AudioFeatures(r.doc_id, e, z)
        }
      }
      .toDF()
      .withColumn("rms", round(sqrt(col("energy").cast("double") / lit(64.0)), 6))
      .select(col("doc_id"), col("energy"), col("zcr"), col("rms"))
      .orderBy("doc_id")
  }

  /** Metadata-only header peek — parses real fields out of the raw
    * payload bytes with COLUMN functions (no codec, no typed map):
    * total size, the 2-char magic, bits-per-pixel (u16le at offset
    * 28), and an md5 fingerprint of the payload hex. Oracle-checked
    * the hard way: DuckDB reconstructs the ENTIRE file hex (header
    * fields + bottom-up BGR rows) from the pixel derivation and md5s
    * it — one flipped byte anywhere in the encoder breaks the match. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    val p = col("payload")
    mediaTable(spark, dir)
      .select(
        col("doc_id"),
        length(p).cast("bigint").as("n_bytes"),
        org.apache.spark.sql.functions.decode(substring(p, 1, 2), "UTF-8").as("fmt"),
        (conv(hex(substring(p, 29, 1)), 16, 10).cast("bigint") +
          conv(hex(substring(p, 30, 1)), 16, 10).cast("bigint") * 256).as("bpp"),
        md5(hex(p)).as("payload_md5"))
      .orderBy("doc_id")
  }

  /** 64-bit perceptual hash (aHash) over the DECODED media: luminance
    * = channel sum of each pixel of the 8×8 decoded grid; bit b is set
    * iff lum_b·64 > Σlum — an exact-integer compare, never a float
    * mean, so both engines emit identical signatures. (For our gray
    * renders lum = 3·gray, and 3p·64 > 3Σ ⇔ p·64 > Σ — the oracle
    * thresholds the raw bytes.) A production pipeline swaps the
    * render for lake bytes and this hash for DCT-pHash in the same
    * typed map; everything downstream — banding, verify, clustering —
    * is unchanged. Columns: doc_id, sig64, hi/lo packed BIGINTs. */
  private[graft] def phash64Table(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val (_, _, px) = Bmp.decodeRgb(r.payload)
          val lum = px.map(Bmp.rgbSum)
          val tot = lum.map(_.toLong).sum
          val sig = lum.map(l => if (l * 64L > tot) '1' else '0').mkString
          (r.doc_id, sig,
            java.lang.Long.parseLong(sig.substring(0, 32), 2),
            java.lang.Long.parseLong(sig.substring(32), 2))
        }
      }
      .toDF("doc_id", "sig64", "hi", "lo")
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
    * loop: render → platform-codec decode → banded pairing → clusters
    * → applied decision, signature machinery shared with the text
    * path. Output: doc_id, cluster_id, n_bytes (real payload size). */
  def dedupApply(spark: SparkSession, dir: String): DataFrame = {
    val cl = graft.ArtifactCache.tableReleasable(spark, "mm_cluster_decision", dir) {
      val (df, h) =
        Dedup.clustersFromPairsReleasable(phashPairArtifact(spark, dir).select("doc_a", "doc_b"))
      (df, () => h.release())
    }
    mediaTable(spark, dir)
      .select(col("doc_id"), length(col("payload")).cast("bigint").as("n_bytes"))
      .join(cl.select("doc_id", "cluster_id", "keep"), Seq("doc_id"), "left")
      .where(coalesce(col("keep"), lit(true)))
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        col("n_bytes"))
      .orderBy("doc_id")
  }
}
