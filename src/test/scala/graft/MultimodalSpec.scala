package graft

import org.apache.spark.sql.functions._

import graft.ops.{Bmp, Multimodal}

/** The multimodal codec boundary: the hand-written BMP encoder must
  * survive a round trip through `javax.imageio` (the PLATFORM decoder,
  * not our encoder's inverse), and the query surface must agree with
  * the direct pixel derivation the DuckDB oracle uses. */
class MultimodalSpec extends SparkSpec {

  test("BMP encode -> platform decode is the identity on the pixel grid") {
    // deterministic non-trivial grid
    val px = Array.tabulate(64)(i => (i * 37 + 11) % 256)
    val bytes = Bmp.encodeGray(px, 8, 8)
    assert(bytes.length === 246)
    assert(bytes(0) === 'B'.toByte && bytes(1) === 'M'.toByte)
    assert(Bmp.u32le(bytes, 2) === 246)
    val (w, h, rgb) = Bmp.decodeRgb(bytes)
    assert(w === 8 && h === 8)
    // gray: every channel carries the gray value, row-major top-down
    assert(rgb.map(p => p & 0xff).toSeq === px.toSeq)
    assert(rgb.map(p => (p >> 16) & 0xff).toSeq === px.toSeq)
  }

  test("BMP encoder handles padded strides and row order on rectangles") {
    // 5×3: stride 16 (3*5=15 padded to 16) — decoded grid must still
    // match row-major top-down, which catches bottom-up/stride bugs
    val px = Array.tabulate(15)(i => (i * 53 + 7) % 256)
    val (w, h, rgb) = Bmp.decodeRgb(Bmp.encodeGray(px, 5, 3))
    assert(w === 5 && h === 3)
    assert(rgb.map(_ & 0xff).toSeq === px.toSeq)
  }

  test("decoded stats equal the direct pixel derivation (oracle's view)") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "n_chars").limit(5).collect()
    val stats = Multimodal.decodeSummary(spark, sf)
      .where(col("doc_id").isin(docs.map(_.getLong(0)): _*))
      .collect().map(r => r.getLong(0) -> r).toMap
    docs.foreach { d =>
      val px = Multimodal.grayPixels(d.getString(1), d.getLong(2))
      val r = stats(d.getLong(0))
      assert(r.getAs[Long]("sum_rgb") === 3L * px.map(_.toLong).sum)
      assert(r.getAs[Long]("px00_rgb") === 3L * px(0))
    }
  }

  test("media meta md5 matches an independently computed payload hash") {
    val d = Tables.documents(spark, sf)
      .select("doc_id", "text", "n_chars").orderBy("doc_id").limit(1).collect().head
    val payload = Bmp.encodeGray(Multimodal.grayPixels(d.getString(1), d.getLong(2)), 8, 8)
    val hex = payload.map(b => f"${b & 0xff}%02X").mkString
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(hex.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val row = Multimodal.mediaMeta(spark, sf)
      .where(col("doc_id") === d.getLong(0)).collect().head
    assert(row.getAs[Long]("n_bytes") === 246L)
    assert(row.getAs[String]("fmt") === "BM")
    assert(row.getAs[Long]("bpp") === 24L)
    assert(row.getAs[String]("payload_md5") === md)
  }

  test("container walk samples frames 0 and 2 with decoded sums") {
    val d = Tables.documents(spark, sf)
      .select("doc_id", "text").orderBy("doc_id").limit(1).collect().head
    val frames = Multimodal.frameSummary(spark, sf)
      .where(col("doc_id") === d.getLong(0)).collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2))
    frames.foreach { f =>
      val px = Multimodal.framePixels(d.getString(1), f.getAs[Int]("frame_idx"))
      assert(f.getAs[Long]("frame_sum") === 3L * px.map(_.toLong).sum)
    }
  }

  test("container walk throws on a corrupt zero-size frame instead of spinning") {
    val good = Bmp.encodeGray(Array.fill(64)(7), 8, 8)
    val corrupt = good.clone()
    // zero the declared file-size field (header offset 2, u32le) —
    // without the size guard the offset iterator would loop forever
    corrupt(2) = 0; corrupt(3) = 0; corrupt(4) = 0; corrupt(5) = 0
    val e = intercept[IllegalArgumentException] {
      Multimodal.frameOffsets(good ++ corrupt, 42L)
    }
    assert(e.getMessage.contains("corrupt container"))
    // the healthy container still walks to its declared frame starts
    assert(Multimodal.frameOffsets(good ++ good, 1L).toSeq === Seq(0, good.length))
  }

  test("audio decode rejects big-endian PCM instead of byte-swapping silently") {
    import javax.sound.sampled._
    // a big-endian PCM_SIGNED container (AIFF) the platform codec
    // parses happily — the little-endian raw read below it would
    // silently byte-swap every sample without the endianness check
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, true)
    val raw = Array[Byte](0x12, 0x34, 0x56, 0x78)
    val stream = new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt, 2)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.AIFF, bos)
    val e = intercept[IllegalArgumentException](
      graft.ops.Wav.decodePcm16(bos.toByteArray))
    assert(e.getMessage.contains("unexpected decoded format"))
  }

  test("WAV encode -> platform decode round-trips signed samples") {
    import graft.ops.Wav
    // spans both sign regimes and the extremes
    val samples = Array(0, 1, -1, 32767, -32768, 12345, -12345, 256, -257)
    val bytes = Wav.encodePcm16(samples)
    assert(bytes.length === 44 + samples.length * 2)
    assert(new String(bytes.take(4), "US-ASCII") === "RIFF")
    val (rate, decoded) = Wav.decodePcm16(bytes)
    assert(rate === Wav.SampleRate)
    assert(decoded.toSeq === samples.toSeq)
  }

  test("decoded audio stats equal the direct sample derivation") {
    val d = Tables.documents(spark, sf)
      .select("doc_id", "text").orderBy("doc_id").limit(3).collect()
    val stats = Multimodal.audioStats(spark, sf)
      .where(col("doc_id").isin(d.map(_.getLong(0)): _*))
      .collect().map(r => r.getLong(0) -> r).toMap
    d.foreach { row =>
      val s = Multimodal.audioSamples(row.getString(1))
      val r = stats(row.getLong(0))
      assert(r.getAs[Int]("n_samples") === 64)
      assert(r.getAs[Long]("sum_abs") === s.map(x => math.abs(x).toLong).sum)
      assert(r.getAs[Long]("peak") === s.map(x => math.abs(x).toLong).max)
    }
  }

  test("phash signature derives from the decoded grid's exact threshold") {
    val d = Tables.documents(spark, sf)
      .select("doc_id", "text", "n_chars").orderBy("doc_id").limit(1).collect().head
    val px = Multimodal.grayPixels(d.getString(1), d.getLong(2))
    val tot = px.map(_.toLong).sum
    val expected = px.map(p => if (p * 64L > tot) '1' else '0').mkString
    val got = Multimodal.phash(spark, sf)
      .where(col("doc_id") === d.getLong(0)).collect().head.getString(1)
    assert(got === expected)
  }
}
