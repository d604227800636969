package graft.ops

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

/** Byte-exact WAV/PCM codec boundary — the audio leg of the
  * multimodal family, same posture as [[Bmp]]: ENCODE is hand-written
  * against the RIFF/WAVE spec (44-byte header + 16-bit little-endian
  * mono PCM) so the file is a deterministic function of the sample
  * vector, and DECODE goes through `javax.sound.sampled` — the
  * platform's audio codec, which parses the RIFF chunks, validates
  * the format, and hands back the PCM frames. Cross-engine equality
  * of decoded sample stats against the oracle's direct derivation
  * pins the round trip.
  */
object Wav {

  val SampleRate = 8000

  /** Encode signed 16-bit mono samples at [[SampleRate]] Hz. */
  def encodePcm16(samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def ascii(o: Int, s: String): Unit = { s.getBytes("US-ASCII").copyToArray(out, o) }
    def u16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def u32(o: Int, v: Int): Unit = { u16(o, v & 0xffff); u16(o + 2, v >>> 16) }
    ascii(0, "RIFF"); u32(4, 36 + dataLen); ascii(8, "WAVE")
    ascii(12, "fmt "); u32(16, 16)      // fmt chunk, PCM
    u16(20, 1); u16(22, 1)              // PCM, mono
    u32(24, SampleRate); u32(28, SampleRate * 2) // byte rate
    u16(32, 2); u16(34, 16)             // block align, bits/sample
    ascii(36, "data"); u32(40, dataLen)
    samples.indices.foreach(i => u16(44 + 2 * i, samples(i) & 0xffff))
    out
  }

  /** Decode via the platform codec; returns (sampleRateHz, samples).
    * `AudioSystem` parses the RIFF chunks and validates the declared
    * format — a malformed header throws here, not downstream. */
  def decodePcm16(bytes: Array[Byte]): (Int, Array[Int]) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      // encoding + endianness checked too: a big-endian or unsigned-PCM
      // file the platform codec happily parses would otherwise be
      // silently mis-decoded (byte-swapped / offset samples) by the
      // little-endian signed raw read below
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        !fmt.isBigEndian,
        s"unexpected decoded format $fmt")
      val raw = in.readAllBytes()
      val n = raw.length / 2
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) {
        val lo = raw(2 * i) & 0xff
        val hi = raw(2 * i + 1).toInt // sign-carrying high byte
        samples(i) = (hi << 8) | lo
        i += 1
      }
      (fmt.getSampleRate.toInt, samples)
    } finally in.close()
  }
}
