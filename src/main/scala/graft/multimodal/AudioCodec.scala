package graft.multimodal

/** Parsed PCM WAV metadata — the audio sibling of [[ImageHeader]]. */
case class WavHeader(sampleRate: Int, channels: Int, bitsPerSample: Int,
                     nSamples: Long)

/** Pure-JVM WAV (RIFF/WAVE) byte handling — REAL format parsing, no
  * external codec dependencies:
  *
  *  - [[parseWav]] validates the RIFF/WAVE container and walks its
  *    chunk list to `fmt ` (PCM audio format, channel count, sample
  *    rate, bits per sample — all little-endian per the RIFF spec) and
  *    `data` (frame count = chunk length / block align).
  *  - [[wavBytes]] ENCODES a canonical 8-bit mono PCM WAV (44-byte
  *    header + samples) — used by the media fixture generator so audio
  *    rows carry bytes a real decoder accepts (spec round-trips them
  *    through javax.sound.sampled).
  *
  * Deterministic byte arithmetic throughout — safe inside per-partition
  * maps, identical across executors. The decoded waveform feeds
  * [[Multimodal.embed]]'s deterministic JL projection, exactly like
  * pixel decode for images. */
object AudioCodec {

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    t.indices.forall(j => b(i + j) == t.charAt(j).toByte)

  def parseWav(b: Array[Byte]): Option[WavHeader] = {
    if (b.length < 44) return None
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    // the cursor is a Long and the chunk length stays unsigned: a
    // malformed length advances past the buffer (loop exits) instead of
    // wrapping negative through toInt (infinite loop / negative index
    // on a corrupt or adversarial file)
    var i = 12L
    var fmt: Option[(Int, Int, Int, Int)] = None // format, ch, rate, bits
    var dataLen: Option[Long] = None
    while (i + 8 <= b.length && (fmt.isEmpty || dataLen.isEmpty)) {
      val ii = i.toInt
      val len = u32le(b, ii + 4)
      if (tag(b, ii, "fmt ") && len >= 16 && i + 8 + 16 <= b.length)
        fmt = Some((u16le(b, ii + 8), u16le(b, ii + 10),
          u32le(b, ii + 12).toInt, u16le(b, ii + 22)))
      else if (tag(b, ii, "data"))
        dataLen = Some(math.min(len, (b.length - i - 8)))
      // chunks are word-aligned: odd lengths carry a pad byte
      i += 8L + len + (len & 1L)
    }
    for {
      (audioFmt, ch, rate, bits) <- fmt
      dl <- dataLen
      if audioFmt == 1 && ch > 0 && rate > 0 && bits > 0 // integer PCM
      blockAlign = ch * (bits / 8)
      if blockAlign > 0
    } yield WavHeader(rate, ch, bits, dl / blockAlign)
  }

  /** The data chunk's sample bytes for 8-bit mono PCM payloads — the
    * decoded WAVEFORM (one unsigned byte per sample), not just the
    * header. None when the container parses but isn't the canonical
    * 8-bit/mono shape (this decoder is honest about what it supports
    * instead of mis-reading other layouts). Same bounds-hardened chunk
    * walk as [[parseWav]]. */
  def pcm8(b: Array[Byte]): Option[Array[Byte]] =
    parseWav(b) match {
      case Some(h) if h.bitsPerSample == 8 && h.channels == 1 =>
        var i = 12L
        var res: Option[Array[Byte]] = None
        while (i + 8 <= b.length && res.isEmpty) {
          val ii = i.toInt
          val len = u32le(b, ii + 4)
          if (tag(b, ii, "data")) {
            val n = math.min(len, b.length - i - 8).toInt
            res = Some(java.util.Arrays.copyOfRange(b, ii + 8, ii + 8 + n))
          }
          i += 8L + len + (len & 1L)
        }
        res
      case _ => None
    }

  /** A canonical 8-bit mono PCM WAV: 44-byte header + `nSamples`
    * deterministic samples seeded by `seed`. */
  def wavBytes(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    require(nSamples > 0, "wav params must be positive")
    val samples = new Array[Byte](nSamples)
    var i = 0
    while (i < nSamples) {
      samples(i) = ((i * 7 + seed) % 256).toByte
      i += 1
    }
    wavBytesOf(sampleRate, samples)
  }

  /** [[wavBytes]] generalized to caller-supplied samples — the ENCODER
    * leg of the codec (the resize/resample path re-encodes through
    * this): 44-byte canonical header + the given 8-bit mono PCM
    * samples, byte-deterministic. */
  def wavBytesOf(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
    require(sampleRate > 0 && samples.nonEmpty, "wav params must be positive")
    val nSamples = samples.length
    val out = new Array[Byte](44 + nSamples)
    def w16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
    }
    def w32(i: Int, v: Long): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
      out(i + 2) = (v >>> 16).toByte; out(i + 3) = (v >>> 24).toByte
    }
    def wtag(i: Int, t: String): Unit =
      t.indices.foreach(j => out(i + j) = t.charAt(j).toByte)
    wtag(0, "RIFF"); w32(4, 36L + nSamples); wtag(8, "WAVE")
    wtag(12, "fmt "); w32(16, 16L)
    w16(20, 1) // PCM
    w16(22, 1) // mono
    w32(24, sampleRate.toLong)
    w32(28, sampleRate.toLong) // byte rate = rate * blockAlign(1)
    w16(32, 1) // block align
    w16(34, 8) // bits per sample
    wtag(36, "data"); w32(40, nSamples.toLong)
    System.arraycopy(samples, 0, out, 44, nSamples)
    out
  }
}
