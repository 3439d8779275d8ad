package graft.multimodal

/** Parsed Y4M stream metadata — the video sibling of [[ImageHeader]] /
  * [[WavHeader]]. `frameSize` is the byte length of ONE frame's plane
  * data (luma-only for mono, 3/2·w·h for 4:2:0). */
case class Y4mHeader(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                     colorspace: String, nFrames: Int, frameSize: Int)

/** Pure-JVM Y4M (YUV4MPEG2) byte handling — REAL container parsing, no
  * external codec dependencies, completing the codec family
  * ([[ImageCodec]] for PNG/JPEG, [[AudioCodec]] for RIFF/WAV):
  *
  *  - [[parseY4m]] validates the `YUV4MPEG2` stream header, reads the
  *    space-separated parameter tags (W width, H height, F fps as
  *    num:den, C colorspace — the published mplayer/ffmpeg wire
  *    format), derives the per-frame plane size from the colorspace
  *    (mono = w·h luma bytes; 420 variants = w·h·3/2), and counts
  *    frames by walking the `FRAME` markers (each its own
  *    newline-terminated line, optionally carrying per-frame params).
  *  - [[lumaFrame]] / [[lumaFrames]] return a frame's LUMA PLANE bytes
  *    (the whole frame for mono; the first w·h bytes for 4:2:0) — the
  *    decoded content m4/m7 hash and feature, not just the header.
  *  - [[y4mBytes]] ENCODES a canonical mono stream (header line +
  *    `FRAME\n`-prefixed planes) — the media fixture generator uses it
  *    so video rows carry bytes a real Y4M reader accepts.
  *
  * Deterministic byte arithmetic throughout; the same bounds-hardened
  * cursor discipline as the WAV chunk walk (a malformed frame size
  * exits the loop instead of wrapping negative). Frame tensors feed
  * [[Multimodal.embed]]'s deterministic JL projection, exactly like
  * pixels and waveforms. */
object VideoCodec {

  private val Magic = "YUV4MPEG2"

  /** Per-frame plane bytes for a colorspace tag, or -1 if unsupported.
    * `C420`-family subsamples chroma 2×2 (w·h·3/2); `Cmono` is the
    * luma-only layout this library encodes. */
  private def frameSizeOf(cs: String, w: Int, h: Int): Int = cs match {
    case "mono" => w * h
    case c if c.startsWith("420") =>
      if (w % 2 == 0 && h % 2 == 0) w * h + 2 * ((w / 2) * (h / 2)) else -1
    case _ => -1
  }

  def parseY4m(b: Array[Byte]): Option[Y4mHeader] = {
    if (b.length < Magic.length + 1) return None
    if (!Magic.indices.forall(i => b(i) == Magic.charAt(i).toByte)) return None
    var eol = Magic.length
    while (eol < b.length && b(eol) != '\n') eol += 1
    if (eol >= b.length) return None // header line never terminates
    val params = new String(b, Magic.length, eol - Magic.length, "US-ASCII")
      .trim.split("\\s+").filter(_.nonEmpty)
    var w = -1; var h = -1; var fn = 25; var fd = 1; var cs = "420jpeg"
    params.foreach { p =>
      (p.charAt(0), p.drop(1)) match {
        case ('W', v) => w = v.toIntOption.getOrElse(-1)
        case ('H', v) => h = v.toIntOption.getOrElse(-1)
        case ('F', v) => v.split(":") match {
          case Array(n, d) =>
            fn = n.toIntOption.getOrElse(-1); fd = d.toIntOption.getOrElse(-1)
          case _ => fn = -1
        }
        case ('C', v) => cs = v
        case _ => // Ip/A/X tags carry no layout information
      }
    }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
    val fs = frameSizeOf(cs, w, h)
    if (fs <= 0) return None
    // frame walk: each frame is a "FRAME[ params]\n" line + fs bytes
    var i = eol + 1L
    var n = 0
    var ok = true
    while (ok && i < b.length) {
      if (i + 5 <= b.length && (0 until 5).forall(j =>
          b((i + j).toInt) == "FRAME".charAt(j).toByte)) {
        var j = i + 5
        while (j < b.length && b(j.toInt) != '\n') j += 1
        if (j >= b.length || j + 1 + fs > b.length) ok = false // truncated
        else { n += 1; i = j + 1 + fs }
      } else ok = false // garbage between frames
    }
    if (!ok && i < b.length) None // reject malformed tails outright
    else Some(Y4mHeader(w, h, fn, fd, cs, n, fs))
  }

  /** The luma plane of frame `idx` (0-based), or None when the stream
    * is malformed or has fewer frames. */
  def lumaFrame(b: Array[Byte], idx: Int): Option[Array[Byte]] =
    lumaFrames(b).slice(idx, idx + 1).map(_._2).nextOption()

  /** All (frame_idx, luma plane) pairs, streamed — the per-frame byte
    * slices a frame-sampling pipeline consumes. */
  def lumaFrames(b: Array[Byte]): Iterator[(Int, Array[Byte])] =
    parseY4m(b) match {
      case None => Iterator.empty
      case Some(hd) =>
        var eol = Magic.length
        while (eol < b.length && b(eol) != '\n') eol += 1
        val luma = hd.width * hd.height
        new Iterator[(Int, Array[Byte])] {
          private var i = eol + 1L
          private var n = 0
          def hasNext: Boolean = n < hd.nFrames
          def next(): (Int, Array[Byte]) = {
            var j = i + 5 // skip "FRAME"
            while (j < b.length && b(j.toInt) != '\n') j += 1
            val start = (j + 1).toInt
            val out = java.util.Arrays.copyOfRange(b, start, start + luma)
            i = j + 1 + hd.frameSize
            n += 1
            (n - 1, out)
          }
        }
    }

  /** Encode a canonical MONO Y4M stream from per-frame luma planes
    * (each must be exactly w·h bytes). */
  def y4mBytes(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
               frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0 && fpsNum > 0 && fpsDen > 0)
    frames.foreach(f => require(f.length == w * h,
      s"frame must be ${w * h} luma bytes, got ${f.length}"))
    val header = s"$Magic W$w H$h F$fpsNum:$fpsDen Ip A1:1 Cmono\n"
      .getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames.map(_.length + marker.length).sum)
    out.write(header)
    frames.foreach { f => out.write(marker); out.write(f) }
    out.toByteArray
  }
}
