package graft.multimodal

/** Parsed image metadata: the real "decode step 1" of an image pipeline
  * (dimension/channel routing, resize planning, corrupt-file quarantine
  * all happen off the header, before any pixel work). */
case class ImageHeader(format: String, width: Int, height: Int,
                       bitDepth: Int, channels: Int)

/** Pure-JVM image byte handling — REAL format parsing, no external
  * codec dependencies:
  *
  *  - [[parsePng]] reads the PNG signature + IHDR chunk (width/height
  *    as big-endian u32 at offsets 16/20, bit depth and color type at
  *    24/25) per the PNG spec (RFC 2083 §4.1.1).
  *  - [[parseJpeg]] walks the JFIF marker stream to the first SOF
  *    (start-of-frame) segment and reads precision/height/width/
  *    component-count (ITU-T.81 §B.2.2), skipping RST/standalone
  *    markers and entropy-coded fill bytes correctly.
  *  - [[pngBytes]] ENCODES a minimal but fully valid 8-bit grayscale
  *    PNG (correct CRC32s, real zlib IDAT) — used by the media fixture
  *    generator so image rows carry bytes a real decoder accepts
  *    (spec round-trips them through javax.imageio).
  *
  * Everything is deterministic byte arithmetic: safe inside codegen'd
  * per-partition maps, identical across executors and JVMs. The
  * [[pngPixels]] pixel plane feeds [[Multimodal.embed]]'s deterministic
  * JL projection; header decode serves the metadata pipeline. */
object ImageCodec {

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private val pngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG color type -> sample channels (spec §4.1.1 table). */
  private def pngChannels(colorType: Int): Option[Int] = colorType match {
    case 0 => Some(1) // grayscale
    case 2 => Some(3) // truecolor
    case 3 => Some(1) // palette (1 index sample)
    case 4 => Some(2) // gray + alpha
    case 6 => Some(4) // truecolor + alpha
    case _ => None
  }

  def parsePng(b: Array[Byte]): Option[ImageHeader] = {
    if (b.length < 33) return None
    if (!pngSig.indices.forall(i => b(i) == pngSig(i))) return None
    // first chunk must be IHDR with length 13
    if (u32(b, 8) != 13L) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = u32(b, 16)
    val h = u32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
    val bitDepth = b(24) & 0xff
    pngChannels(b(25) & 0xff)
      .map(ch => ImageHeader("png", w.toInt, h.toInt, bitDepth, ch))
  }

  /** SOF markers carrying frame dimensions: C0-C3, C5-C7, C9-CB, CD-CF
    * (C4 = DHT, C8 = JPG extension, CC = DAC are not frames). */
  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  def parseJpeg(b: Array[Byte]): Option[ImageHeader] = {
    if (b.length < 4) return None
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None // SOI
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // marker alignment lost
      var m = b(i + 1) & 0xff
      // fill bytes: any number of 0xFF may pad before a marker
      while (m == 0xff && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xff }
      if (m == 0xd9 || m == 0xda) return None // EOI / SOS before any SOF
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 } // standalone
      else {
        // the fill-byte skip moved i: re-check the 2-byte length fits
        // (a truncated file must reject, not index past the array)
        if (i + 3 >= b.length) return None
        val len = u16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        if (isSof(m)) {
          if (len < 8) return None
          val precision = b(i + 4) & 0xff
          val h = u16(b, i + 5)
          val w = u16(b, i + 7)
          val ch = b(i + 9) & 0xff
          if (w <= 0 || h <= 0 || ch <= 0) return None
          return Some(ImageHeader("jpeg", w, h, precision, ch))
        }
        i += 2 + len
      }
    }
    None
  }

  /** Try PNG then JPEG; None = not a (supported) image payload. */
  def parseImageHeader(b: Array[Byte]): Option[ImageHeader] =
    parsePng(b).orElse(parseJpeg(b))

  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val len = data.length
    out.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
      (len >>> 8).toByte, len.toByte))
    val typeBytes = tpe.getBytes("US-ASCII")
    out.write(typeBytes)
    out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typeBytes)
    crc.update(data)
    val c = crc.getValue
    out.write(Array((c >>> 24).toByte, (c >>> 16).toByte,
      (c >>> 8).toByte, c.toByte))
    out.toByteArray
  }

  /** A valid 8-bit grayscale PNG of `width`x`height`, every pixel =
    * `fill`: signature + IHDR + one zlib-deflated IDAT (each scanline
    * prefixed with filter byte 0) + IEND, all CRCs real. Deterministic
    * for fixed inputs (Deflater with a pinned level, no timestamps). */
  def pngBytes(width: Int, height: Int, fill: Byte): Array[Byte] =
    pngBytesOf(width, height, (_, _) => fill)

  /** [[pngBytes]] generalized to a per-pixel function — the fixture
    * generator uses a content pattern so pixel-level operators (m8's
    * aHash) see non-degenerate images. Same container: 8-bit
    * grayscale, filter 0 scanlines, one IDAT, real CRCs. */
  def pngBytesOf(width: Int, height: Int,
                 f: (Int, Int) => Byte): Array[Byte] = {
    require(width > 0 && height > 0, "png dims must be positive")
    val ihdr = new Array[Byte](13)
    ihdr(0) = (width >>> 24).toByte; ihdr(1) = (width >>> 16).toByte
    ihdr(2) = (width >>> 8).toByte; ihdr(3) = width.toByte
    ihdr(4) = (height >>> 24).toByte; ihdr(5) = (height >>> 16).toByte
    ihdr(6) = (height >>> 8).toByte; ihdr(7) = height.toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // color type: grayscale
    // 10..12: compression 0, filter 0, interlace 0 (array is zeroed)
    val raw = new Array[Byte]((width + 1) * height)
    var y = 0
    while (y < height) {
      // raw(y * (width + 1)) = 0: filter type None
      var x = 0
      while (x < width) {
        raw(y * (width + 1) + 1 + x) = f(x, y)
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    deflater.setInput(raw)
    deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(pngSig)
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", zOut.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** REAL pixel decode for 8-bit grayscale non-interlaced PNGs: walks
    * the chunk stream collecting IDAT payloads, inflates the zlib
    * stream (java.util.zip — pure JVM), and reverses all five scanline
    * filters of the PNG spec §6 (None/Sub/Up/Average/Paeth, bpp = 1).
    * Returns (width, height, row-major pixels). None for anything that
    * isn't a well-formed 8-bit grayscale PNG — a pixel pipeline
    * quarantines those, it never guesses. Deterministic byte
    * arithmetic end-to-end (inflate is bit-exact by definition);
    * [[graft.MultimodalSpec]] pins the output to a javax.imageio
    * decode of the same bytes, filtered fixtures included. */
  def pngPixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val header = parsePng(b).getOrElse(return None)
    if (header.bitDepth != 8 || header.channels != 1) return None
    if ((b(25) & 0xff) != 0 || (b(28) & 0xff) != 0) return None // gray, no interlace
    val (w, h) = (header.width, header.height)
    // chunk walk: concatenate IDAT payloads until IEND
    val z = new java.io.ByteArrayOutputStream()
    var i = 8
    var done = false
    while (!done) {
      if (i + 8 > b.length) return None
      val len = u32(b, i)
      if (len > Int.MaxValue || i + 12 + len > b.length) return None
      val tpe = new String(b, i + 4, 4, "US-ASCII")
      if (tpe == "IDAT") z.write(b, i + 8, len.toInt)
      if (tpe == "IEND") done = true
      i += 12 + len.toInt
    }
    val raw = new Array[Byte]((w + 1) * h)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(z.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        if (n == 0 && inflater.needsInput()) return None // truncated
        off += n
      }
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    if (off != raw.length) return None
    // reverse scanline filters (PNG spec §6.2-6.6; bpp = 1)
    val px = new Array[Byte](w * h)
    def paeth(a: Int, bb: Int, c: Int): Int = {
      val p = a + bb - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - bb), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
    }
    var y = 0
    while (y < h) {
      val ft = raw(y * (w + 1)) & 0xff
      if (ft > 4) return None
      var x = 0
      while (x < w) {
        val cur = raw(y * (w + 1) + 1 + x) & 0xff
        val left = if (x > 0) px(y * w + x - 1) & 0xff else 0
        val up = if (y > 0) px((y - 1) * w + x) & 0xff else 0
        val ul = if (x > 0 && y > 0) px((y - 1) * w + x - 1) & 0xff else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, ul)
        }
        px(y * w + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }
}
