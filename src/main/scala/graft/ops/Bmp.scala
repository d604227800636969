package graft.ops

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

/** Byte-exact BMP codec boundary for the multimodal family.
  *
  * ENCODE is hand-written against the BMP spec (BITMAPFILEHEADER +
  * BITMAPINFOHEADER, 24 bpp, bottom-up rows, BGR, 4-byte row padding)
  * so the emitted file is a deterministic function of the pixel grid —
  * the DuckDB oracle reconstructs the same bytes hex-for-hex and the
  * cross-engine compare pins the whole container format, not just the
  * stats. DECODE goes through `javax.imageio` — the PLATFORM codec,
  * not the inverse of our encoder — so a round-trip equality against
  * the oracle's direct pixel derivation proves a real foreign decoder
  * read our bytes correctly (the de-stub the round-9 verdict asked
  * for: reference's media handling is opaque-payload + codec at the
  * boundary; see SURVEY.md §5 multimodal posture).
  *
  * Scale note: both directions are per-record pure functions used
  * inside `mapPartitions` — map-only stages whose partition sizing is
  * governed by payload bytes (`maxPartitionBytes`), nothing here
  * shuffles.
  */
object Bmp {

  // ImageIO.read(InputStream) defaults to a DISK-backed image cache:
  // every decode spills the stream to a temp file first (one file per
  // payload — 150k per corpus pass), and temp-file churn serializes
  // badly under concurrent decode tasks. The payloads are small
  // in-memory byte arrays; cache them in memory instead. Process-wide,
  // set once at class init (executor-side too: first decode task loads
  // this class before touching ImageIO).
  ImageIO.setUseCache(false)

  /** Encode a w×h 8-bit gray grid (row-major, TOP-DOWN) as a 24-bit
    * BMP: gray value replicated into B,G,R. Deterministic: ppm/reserved
    * fields zero, padding bytes zero, imageSize = stride·h. */
  def encodeGray(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(px.length == w * h, s"pixel grid ${px.length} != $w x $h")
    val stride = ((3 * w + 3) / 4) * 4
    val size = 54 + stride * h
    val out = new Array[Byte](size)
    def u16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def u32(o: Int, v: Int): Unit = { u16(o, v & 0xffff); u16(o + 2, v >>> 16) }
    out(0) = 'B'; out(1) = 'M'
    u32(2, size); u32(10, 54)          // file size, pixel-data offset
    u32(14, 40); u32(18, w); u32(22, h) // info header, positive h = bottom-up
    u16(26, 1); u16(28, 24)             // planes, bpp
    u32(34, stride * h)                 // imageSize (compression 0 at 30)
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val v = (px(y * w + x) & 0xff).toByte
        val o = rowOff + 3 * x
        out(o) = v; out(o + 1) = v; out(o + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode any image the platform codec recognizes; returns (w, h,
    * packed 0xRRGGBB row-major top-down). Throws on undecodable bytes
    * — a corrupt payload is a data defect, not a skippable row. */
  def decodeRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload not decodable as an image")
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    (w, h, px.map(_ & 0xffffff))
  }

  /** Channel sum R+G+B of one packed pixel. */
  @inline def rgbSum(p: Int): Int = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)

  /** u32 little-endian read — the container walk reads each BMP's
    * declared file size (offset 2) to advance to the next frame. */
  def u32le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
}
