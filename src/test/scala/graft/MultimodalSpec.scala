package graft

import graft.multimodal.{AudioCodec, ImageCodec, ImageHeader, Multimodal, VideoCodec, WavHeader}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The image decode path is REAL byte parsing — prove it against a real
  * codec: javax.imageio encodes reference images in-memory and the
  * header parsers must recover the known dimensions/channels; our own
  * PNG encoder must round-trip through javax.imageio's decoder. */
class MultimodalSpec extends GraftSpec {

  private def imageIoBytes(w: Int, h: Int, imgType: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    // deterministic non-trivial pixels so encoders emit real scan data
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  test("parsePng recovers dimensions/channels from an ImageIO-encoded PNG") {
    val b = imageIoBytes(17, 23, java.awt.image.BufferedImage.TYPE_INT_RGB, "png")
    assert(ImageCodec.parsePng(b) ===
      Some(ImageHeader("png", 17, 23, 8, 3)))
    assert(ImageCodec.parseImageHeader(b).map(_.format) === Some("png"))
  }

  test("parseJpeg recovers dimensions/channels from an ImageIO-encoded JPEG") {
    val b = imageIoBytes(31, 13, java.awt.image.BufferedImage.TYPE_3BYTE_BGR, "jpg")
    val hdr = ImageCodec.parseJpeg(b)
    assert(hdr.isDefined, "JPEG SOF scan found no frame header")
    assert(hdr.get === ImageHeader("jpeg", 31, 13, 8, 3))
  }

  test("pngBytes encodes a PNG a real decoder accepts, at the declared dims") {
    val b = ImageCodec.pngBytes(9, 7, fill = 42)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    assert(img != null, "javax.imageio rejected our PNG")
    assert(img.getWidth === 9 && img.getHeight === 7)
    // every pixel carries the fill value (raw raster sample — getRGB
    // would apply Java's linear-gray -> sRGB conversion)
    assert(img.getRaster.getSample(4, 3, 0) === 42)
    // and our own parser agrees with what we encoded
    assert(ImageCodec.parsePng(b) === Some(ImageHeader("png", 9, 7, 8, 1)))
  }

  test("non-image payloads parse to None, never a bogus header") {
    assert(ImageCodec.parseImageHeader("plain text".getBytes("UTF-8")).isEmpty)
    assert(ImageCodec.parseImageHeader(Array[Byte]()).isEmpty)
    // truncated PNG signature
    assert(ImageCodec.parseImageHeader(Array[Byte](0x89.toByte, 'P', 'N')).isEmpty)
  }

  test("m2 feature rows: image payloads decode to their metadata dims") {
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaFromDocs(spark, sfDir)).toDF().cache()
    try {
      val img = feats.filter(col("kind") === "image")
      assert(img.count() > 0)
      // the real header parse must agree with the fixture's metadata on
      // EVERY image row (the PNG was encoded at exactly those dims)
      val media = Multimodal.mediaFromDocs(spark, sfDir).toDF()
        .select(col("media_id"), col("width"), col("height"))
      val joined = img.join(media, "media_id")
      assert(joined.filter(col("decoded_format") =!= "png" ||
        col("decoded_w") =!= col("width") ||
        col("decoded_h") =!= col("height") ||
        col("channels") =!= 1).count() === 0,
        "decoded header disagrees with encoded dims")
      // audio rows decode as mono WAV at the metadata-derived rate
      val wav = feats.filter(col("kind") === "audio")
      assert(wav.count() > 0)
      assert(wav.filter(col("decoded_format") =!= "wav" ||
        col("channels") =!= 1 ||
        col("decoded_w") < 8000 || col("decoded_w") > 15000 ||
        col("decoded_h") < 1).count() === 0,
        "audio rows must parse as mono PCM WAV at the fixture rate")
      // video rows decode as mono Y4M at exactly the metadata dims
      val vid = feats.filter(col("kind") === "video")
      assert(vid.count() > 0)
      val vmedia = Multimodal.mediaFromDocs(spark, sfDir).toDF()
        .select(col("media_id"), col("width"), col("height"))
      assert(vid.join(vmedia, "media_id")
        .filter(col("decoded_format") =!= "y4m" ||
          col("decoded_w") =!= col("width") ||
          col("decoded_h") =!= col("height") ||
          col("channels") =!= 1).count() === 0,
        "video rows must parse as mono Y4M at the encoded dims")
    } finally feats.unpersist()
  }

  test("parseWav recovers rate/channels/frames; javax.sound accepts ours") {
    val b = AudioCodec.wavBytes(sampleRate = 11025, nSamples = 321, seed = 5)
    assert(AudioCodec.parseWav(b) === Some(WavHeader(11025, 1, 8, 321L)))
    // a real decoder agrees with what we encoded
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(b))
    assert(in.getFormat.getSampleRate === 11025f)
    assert(in.getFormat.getChannels === 1)
    assert(in.getFrameLength === 321L)
    // and our parser reads a javax.sound-encoded WAV (the reverse trip)
    val fmt = new javax.sound.sampled.AudioFormat(22050f, 16, 2, true, false)
    val raw = new Array[Byte](400) // 100 frames * 4 bytes
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, 100L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val parsed = AudioCodec.parseWav(bos.toByteArray)
    assert(parsed === Some(WavHeader(22050, 2, 16, 100L)))
    // garbage rejects cleanly
    assert(AudioCodec.parseWav("RIFFnope".getBytes("UTF-8")).isEmpty)
  }

  test("m6: window features match a javax.sound decode of the same bytes") {
    // pcm8 agrees with a REAL decoder sample-for-sample on a fixture
    val b = AudioCodec.wavBytes(sampleRate = 11025, nSamples = 2500, seed = 9)
    val ours = AudioCodec.pcm8(b).get
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(b))
    val theirs = in.readAllBytes()
    assert(ours.toSeq === theirs.toSeq, "pcm8 must equal the real decode")
    // the m6 relation reproduces an exact in-process recomputation over
    // the javax.sound-decoded samples of every audio payload
    val media = Multimodal.mediaFromDocs(spark, sfDir)
      .filter(_.kind == "audio").collect()
    val win = 1024
    val expect = media.flatMap { r =>
      val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.bytes)).readAllBytes()
      pcm.grouped(win).zipWithIndex.map { case (w, idx) =>
        val s = w.map(x => (x & 0xff) - 128)
        val crossings = s.zip(s.tail).count { case (a, c) => a * c < 0 }
        ((r.media_id, idx), (w.length, s.map(v => v.toLong * v).sum,
          crossings.toLong, s.map(v => math.abs(v).toLong).max))
      }
    }.toMap
    val res = Multimodal.audioWindows(spark, sfDir, win).collect()
    assert(res.length === expect.size)
    assert(res.length > media.length, "multi-window payloads must exist")
    res.foreach { r =>
      val (n, energy, zc, peak) =
        expect((r.getAs[Long]("media_id"), r.getAs[Int]("window_idx")))
      assert(r.getAs[Int]("n_samples") === n)
      assert(r.getAs[Long]("energy") === energy)
      assert(r.getAs[Long]("zero_crossings") === zc)
      assert(r.getAs[Long]("peak") === peak)
    }
  }

  test("malformed containers reject in finite time, never hang or throw") {
    // a chunk length of 0xFFFFFFF8 once truncated to Int is -8: the
    // cursor would advance by zero (infinite loop) — must return None
    val evilWav = "RIFF".getBytes("US-ASCII") ++ Array[Byte](36, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ "JUNK".getBytes("US-ASCII") ++
      Array[Byte](0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte) ++
      new Array[Byte](24)
    assert(AudioCodec.parseWav(evilWav).isEmpty)
    // SOI followed by trailing fill bytes: the fill-byte skip moves the
    // cursor past the bound the outer loop checked — must reject, not
    // read past the array
    assert(ImageCodec.parseJpeg(Array(0xFF, 0xD8, 0xFF, 0xFF, 0xFF, 0xFF)
      .map(_.toByte)).isEmpty)
    // truncated right after a valid marker id, before its length bytes
    assert(ImageCodec.parseJpeg(Array(0xFF, 0xD8, 0xFF, 0xE0, 0x00)
      .map(_.toByte)).isEmpty)
  }

  test("pngPixels equals a javax.imageio decode, for every filter type") {
    import graft.multimodal.ImageCodec
    def viaImageIO(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val (w, h) = (img.getWidth, img.getHeight)
      val px = new Array[Byte](w * h)
      for (y <- 0 until h; x <- 0 until w)
        px(y * w + x) = (img.getRaster.getSample(x, y, 0) & 0xff).toByte
      (w, h, px)
    }
    // our own filter-0 encode, patterned
    val b0 = ImageCodec.pngBytesOf(37, 23, graft.multimodal.Multimodal.patternOf(7))
    assert(ImageCodec.pngPixels(b0).map { case (w, h, p) => (w, h, p.toSeq) } ===
      Some(viaImageIO(b0)).map { case (w, h, p) => (w, h, p.toSeq) })
    // hand-built PNGs exercising filters 1-4 (Sub/Up/Average/Paeth):
    // reuse the encoder's container but rewrite the raw scanlines
    def encodeFiltered(w: Int, h: Int, pix: (Int, Int) => Int,
                       filter: Int): Array[Byte] = {
      val raw = new Array[Byte]((w + 1) * h)
      def paeth(a: Int, b: Int, c: Int): Int = {
        val p = a + b - c
        val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
        if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
      }
      for (y <- 0 until h) {
        raw(y * (w + 1)) = filter.toByte
        for (x <- 0 until w) {
          val cur = pix(x, y)
          val left = if (x > 0) pix(x - 1, y) else 0
          val up = if (y > 0) pix(x, y - 1) else 0
          val ul = if (x > 0 && y > 0) pix(x - 1, y - 1) else 0
          val enc = filter match {
            case 1 => cur - left
            case 2 => cur - up
            case 3 => cur - (left + up) / 2
            case 4 => cur - paeth(left, up, ul)
          }
          raw(y * (w + 1) + 1 + x) = (enc & 0xff).toByte
        }
      }
      // container: IHDR/IDAT/IEND with real CRCs via a throwaway encode,
      // splicing our deflated scanlines into a fresh IDAT
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val zOut = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      val plain = ImageCodec.pngBytesOf(w, h, (_, _) => 0)
      // locate IDAT in the plain container and rebuild around it
      val out = new java.io.ByteArrayOutputStream()
      out.write(plain, 0, 33) // signature + IHDR chunk
      val data = zOut.toByteArray
      val lenB = Array((data.length >>> 24).toByte, (data.length >>> 16).toByte,
        (data.length >>> 8).toByte, data.length.toByte)
      out.write(lenB)
      val tb = "IDAT".getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      val c = crc.getValue
      out.write(Array((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
      out.write(plain, plain.length - 12, 12) // IEND chunk
      out.toByteArray
    }
    val pix = (x: Int, y: Int) => (x * 11 + y * 5 + (x * y) % 17) % 251
    for (filter <- 1 to 4) {
      val bytes = encodeFiltered(19, 13, pix, filter)
      val got = ImageCodec.pngPixels(bytes)
      assert(got.isDefined, s"filter $filter must decode")
      val (w, h, p) = got.get
      val (wI, hI, pI) = viaImageIO(bytes)
      assert((w, h) === (wI, hI))
      assert(p.toSeq === pI.toSeq, s"filter $filter pixel mismatch vs ImageIO")
    }
  }

  test("m8: hashes recompute from ImageIO pixels; pairs are exactly the " +
    "<= 10 Hamming set") {
    import graft.multimodal.{ImageCodec, Multimodal}
    val media = Multimodal.mediaFromDocs(spark, sfDir).collect()
      .filter(_.kind == "image")
    val hashes = media.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.bytes))
      val (w, h) = (img.getWidth, img.getHeight)
      val px = new Array[Byte](w * h)
      for (y <- 0 until h; x <- 0 until w)
        px(y * w + x) = (img.getRaster.getSample(x, y, 0) & 0xff).toByte
      r.media_id -> Multimodal.aHash(w, h, px)
    }.toMap
    // operator hashes (via our own decoder) must equal the ImageIO-anchored ones
    media.foreach { r =>
      val (w, h, px) = ImageCodec.pngPixels(r.bytes).get
      assert(Multimodal.aHash(w, h, px) === hashes(r.media_id),
        s"decoder disagreement for media ${r.media_id}")
    }
    val ids = hashes.keys.toSeq.sorted
    val expect = (for {
      i <- ids.indices.iterator
      j <- (i + 1 until ids.length).iterator
      (a0, a1) = hashes(ids(i))
      (b0, b1) = hashes(ids(j))
      d = java.lang.Long.bitCount(a0 ^ b0) + java.lang.Long.bitCount(a1 ^ b1)
      if d <= 10
    } yield (ids(i), ids(j)) -> d.toLong).toMap
    val res = Multimodal.imageNearDup(spark, sfDir).collect()
    assert(res.length === expect.size)
    res.foreach { r =>
      val key = (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))
      assert(expect(key) === r.getAs[Long]("hamming"))
    }
  }

  /** Independent in-process Y4M frame walk (deliberately NOT
    * VideoCodec): find the header newline, read W/H from the tags,
    * then slice mono frames at fixed "FRAME\n" + w·h offsets — an
    * anchor implementation the operator's decoder must agree with. */
  private def refY4mFrames(b: Array[Byte]): (Int, Int, Seq[Array[Byte]]) = {
    val hdrEnd = b.indexOf('\n'.toByte)
    val tags = new String(b, 0, hdrEnd, "US-ASCII").split(" ")
    val w = tags.find(_.startsWith("W")).get.drop(1).toInt
    val h = tags.find(_.startsWith("H")).get.drop(1).toInt
    assert(tags.contains("Cmono"), "fixture videos are mono Y4M")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val frames = Seq.newBuilder[Array[Byte]]
    var i = hdrEnd + 1
    while (i < b.length) {
      assert(marker.indices.forall(j => b(i + j) == marker(j)),
        s"expected FRAME marker at $i")
      frames += java.util.Arrays.copyOfRange(
        b, i + marker.length, i + marker.length + w * h)
      i += marker.length + w * h
    }
    (w, h, frames.result())
  }

  test("m7: cuts and scene ids recompute exactly from an independent " +
    "Y4M walk; scene ids are contiguous from 1 per video") {
    import graft.multimodal.Multimodal
    val media = Multimodal.mediaFromDocs(spark, sfDir).collect()
      .filter(_.kind == "video")
      .map(r => r.media_id -> r).toMap
    val res = Multimodal.sceneCuts(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("media_id"))
    assert(res.keySet === media.keySet)
    var cuts = 0; var nonCuts = 0
    res.foreach { case (mid, rows) =>
      val r = media(mid)
      val (w, h, allFrames) = refY4mFrames(r.bytes)
      assert((w, h) === (r.width, r.height))
      assert(allFrames.length === r.n_frames,
        "encoded frame count must equal the metadata")
      val idxs = Range(0, r.n_frames, 10).toArray
      val feats = idxs.map(f => Multimodal.frameLumaGrid(w, h, allFrames(f)))
      val sorted = rows.sortBy(_.getAs[Long]("frame_idx"))
      assert(sorted.map(_.getAs[Long]("frame_idx")).toSeq === idxs.map(_.toLong).toSeq)
      var scene = 0L
      sorted.zipWithIndex.foreach { case (row, i) =>
        if (i == 0) {
          assert(row.isNullAt(row.fieldIndex("diff_energy")))
          assert(row.getAs[Boolean]("is_cut"))
        } else {
          val d = feats(i).zip(feats(i - 1))
            .map { case (a, b) => math.abs(a - b) }.sum
          assert(row.getAs[Long]("diff_energy") === d)
          assert(row.getAs[Boolean]("is_cut") === (d > 20000L))
          if (row.getAs[Boolean]("is_cut")) cuts += 1 else nonCuts += 1
        }
        if (row.getAs[Boolean]("is_cut")) scene += 1
        assert(row.getAs[Long]("scene_id") === scene)
      }
      assert(sorted.head.getAs[Long]("scene_id") === 1L)
    }
    // the threshold must DISCRIMINATE on this corpus: both in-scene
    // (no cut) and cross-scene (cut) transitions occur
    assert(cuts > 0, "no scene cuts fired — threshold too high")
    assert(nonCuts > 0, "every transition cut — threshold too low")
  }

  test("m4: frame-dedup hashes recompute from the independent Y4M walk; " +
    "the shared title card collapses across same-dims videos") {
    import graft.multimodal.Multimodal
    val media = Multimodal.mediaFromDocs(spark, sfDir).collect()
      .filter(_.kind == "video")
    val want = media.flatMap { r =>
      val (w, h, frames) = refY4mFrames(r.bytes)
      Range(0, frames.length, 10).map(f =>
        (r.media_id, f.toLong) -> Multimodal.framePlaneHash(w, h, frames(f)))
    }.toMap
    val res = Multimodal.frameDedup(spark, sfDir).collect()
    assert(res.length === want.size)
    res.foreach { row =>
      val key = (row.getAs[Long]("media_id"), row.getAs[Int]("frame_idx").toLong)
      assert(row.getAs[Long]("frame_hash") === want(key))
    }
    // every frame 0 is the constant title card: within an equal-dims
    // group all frame-0 rows share one hash, and any group with > 1
    // video yields duplicates (the m4 use case, present at this SF)
    val frame0 = res.filter(_.getAs[Int]("frame_idx") === 0)
    val dupTitleCards = frame0.filter(_.getAs[Boolean]("is_duplicate"))
    assert(dupTitleCards.nonEmpty,
      "no duplicate title cards found — fixture lost its dup structure")
    // group_size agrees with the hash multiplicity
    val byHash = res.groupBy(_.getAs[Long]("frame_hash"))
    res.foreach { row =>
      assert(row.getAs[Long]("group_size") ===
        byHash(row.getAs[Long]("frame_hash")).length.toLong)
    }
  }

  test("VideoCodec: encode → parse → frame round trip; malformed streams reject") {
    import graft.multimodal.VideoCodec
    val frames = (0 until 3).map(f =>
      Array.tabulate(20 * 10)(i => ((i * 7 + f * 31) % 251).toByte))
    val b = VideoCodec.y4mBytes(20, 10, 25, 1, frames)
    val hd = VideoCodec.parseY4m(b).get
    assert((hd.width, hd.height, hd.fpsNum, hd.fpsDen) === ((20, 10, 25, 1)))
    assert(hd.colorspace === "mono" && hd.nFrames === 3 && hd.frameSize === 200)
    val back = VideoCodec.lumaFrames(b).toSeq
    assert(back.map(_._1) === Seq(0, 1, 2))
    back.zip(frames).foreach { case ((_, got), want) =>
      assert(got.toSeq === want.toSeq)
    }
    assert(VideoCodec.lumaFrame(b, 1).get.toSeq === frames(1).toSeq)
    // a C420 header from another encoder parses (frame size 3/2·w·h)
    val h420 = "YUV4MPEG2 W4 H2 F30:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
    val f420 = "FRAME\n".getBytes("US-ASCII") ++ new Array[Byte](12)
    val parsed420 = VideoCodec.parseY4m(h420 ++ f420 ++ f420).get
    assert(parsed420.frameSize === 12 && parsed420.nFrames === 2)
    // luma slice of a 420 frame is its first w·h bytes
    assert(VideoCodec.lumaFrame(h420 ++ f420, 0).get.length === 8)
    // malformed: wrong magic, truncated frame, garbage tail
    assert(VideoCodec.parseY4m("JUNK".getBytes("US-ASCII")).isEmpty)
    assert(VideoCodec.parseY4m(
      java.util.Arrays.copyOf(b, b.length - 5)).isEmpty)
    assert(VideoCodec.parseY4m(
      b ++ "tail-garbage".getBytes("US-ASCII")).isEmpty)
  }

  test("m10: banded pHash pairs are COMPLETE vs an in-process all-pairs " +
    "pass; exact duplicates land at hamming 0") {
    val imgs = Multimodal.mediaFromDocs(spark, sfDir)
      .filter(_.kind == "image").collect()
    val hashes = imgs.flatMap { r =>
      ImageCodec.pngPixels(r.bytes).map { case (w, h, px) =>
        r.media_id -> Multimodal.pHash(w, h, px)
      }
    }
    assert(hashes.nonEmpty)
    // determinism: recompute equals
    imgs.take(3).foreach { r =>
      ImageCodec.pngPixels(r.bytes).foreach { case (w, h, px) =>
        assert(Multimodal.pHash(w, h, px) === Multimodal.pHash(w, h, px))
      }
    }
    // brute-force truth at the same threshold
    val maxHamming = 10
    val truth = (for {
      (a, (a0, a1)) <- hashes
      (b, (b0, b1)) <- hashes
      if a < b
      d = java.lang.Long.bitCount(a0 ^ b0) + java.lang.Long.bitCount(a1 ^ b1)
      if d <= maxHamming
    } yield (a, b, d.toLong)).toSet
    val got = Multimodal.imagePHashDup(spark, sfDir, maxHamming).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"),
        r.getAs[Long]("hamming"))).toSet
    assert(got === truth,
      "byte-band blocking must find exactly the all-pairs admissions")
    // identical payloads hash identically: at least one 0-distance pair
    // exists in this fixture corpus (duplicate media payloads)
    assert(truth.exists(_._3 == 0L))
    // DC bit of every hash is 0 (word0 bit 0)
    hashes.foreach { case (_, (h0, _)) => assert((h0 & 1L) === 0L) }
  }

  test("m9: VAD segments reproduce an in-process run-collapse over the " +
    "m6 windows; segments partition each track") {
    val threshold = 5500L
    val windows = Multimodal.audioWindows(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("media_id"),
        r.getAs[Int]("window_idx").toLong,
        r.getAs[Int]("n_samples").toLong, r.getAs[Long]("energy"),
        r.getAs[Long]("peak")))
    val expected = windows.groupBy(_._1).flatMap { case (mid, ws) =>
      val sorted = ws.sortBy(_._2)
      // in-process maximal same-class runs
      val segs = scala.collection.mutable.ArrayBuffer
        .empty[(Boolean, Long, Long, Long, Long, Long)]
      sorted.foreach { case (_, idx, n, e, p) =>
        val active = e >= n * threshold
        segs.lastOption match {
          case Some((a, s, last, cnt, te, pk)) if a == active && last == idx - 1 =>
            segs(segs.length - 1) = (a, s, idx, cnt + 1, te + e, math.max(pk, p))
          case _ => segs += ((active, idx, idx, 1L, e, p))
        }
      }
      segs.zipWithIndex.map { case ((a, s, e2, cnt, te, pk), i) =>
        (mid, i + 1L) -> ((a, s, e2, cnt, te, pk))
      }
    }
    val got = Multimodal.vadSegments(spark, sfDir).collect()
    assert(got.nonEmpty)
    // both activity classes appear somewhere in the corpus
    assert(got.exists(_.getAs[Boolean]("active")))
    assert(got.exists(!_.getAs[Boolean]("active")))
    assert(got.length === expected.size)
    got.foreach { r =>
      val (a, s, e2, cnt, te, pk) = expected(
        (r.getAs[Long]("media_id"), r.getAs[Long]("segment_idx")))
      assert(r.getAs[Boolean]("active") === a)
      assert(r.getAs[Long]("start_window") === s)
      assert(r.getAs[Long]("end_window") === e2)
      assert(r.getAs[Long]("n_windows") === cnt)
      assert(r.getAs[Long]("total_energy") === te)
      assert(r.getAs[Long]("peak") === pk)
    }
    // segments tile each track: window counts sum to the track's windows
    windows.groupBy(_._1).foreach { case (mid, ws) =>
      val segWs = got.filter(_.getAs[Long]("media_id") == mid)
        .map(_.getAs[Long]("n_windows")).sum
      assert(segWs === ws.length.toLong)
    }
  }

  test("m11: storyboard medoids recompute exactly from an independent " +
    "Y4M walk; scenes tile each video") {
    import graft.multimodal.Multimodal
    val media = Multimodal.mediaFromDocs(spark, sfDir).collect()
      .filter(_.kind == "video")
    // independent recompute: frames -> scenes (m7's rule) -> L1 medoid
    val want = media.flatMap { r =>
      val (w, h, frames) = refY4mFrames(r.bytes)
      val idxs = Range(0, frames.length, 10).toArray
      val feats = idxs.map(f => Multimodal.frameLumaGrid(w, h, frames(f)))
      var scene = 0L
      val assigned = idxs.zipWithIndex.map { case (fi, i) =>
        val cut = i == 0 || feats(i).zip(feats(i - 1))
          .map { case (a, b) => math.abs(a - b) }.sum > 20000L
        if (cut) scene += 1
        (scene, fi.toLong, feats(i))
      }
      assigned.groupBy(_._1).toSeq.map { case (sid, fs) =>
        val n = fs.length.toLong
        val sums = fs.map(_._3).transpose.map(_.sum)
        val scored = fs.map { case (_, fi, ft) =>
          (ft.zip(sums).map { case (v, s) => math.abs(n * v - s) }.sum, fi)
        }.sortBy(identity)
        val (disp, kf) = scored.head
        (r.media_id, sid, fs.map(_._2).min, fs.map(_._2).max, n, kf, disp)
      }
    }.sortBy(t => (t._1, t._2))
    val got = Multimodal.storyboard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want.toSeq)
    // scenes tile: per video, frame counts sum to the sampled walk and
    // extents are disjoint in scene order
    got.groupBy(_._1).foreach { case (mid, rows) =>
      val r = media.find(_.media_id == mid).get
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._5).sum ===
        Range(0, r.n_frames, 10).length.toLong)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 < b._3)
        case _ =>
      }
      // every keyframe lies inside its scene's extent
      sorted.foreach(s => assert(s._6 >= s._3 && s._6 <= s._4))
    }
  }

  /** Splice a tEXt ancillary chunk before IEND: the container bytes
    * change, the decoded pixel plane does not — the probe that proves
    * an "embedding" reads the decode, not the payload. */
  private def pngWithAncillaryChunk(png: Array[Byte]): Array[Byte] = {
    val data = "k graft".getBytes("ISO-8859-1")
    val crc = new java.util.zip.CRC32()
    crc.update("tEXt".getBytes("US-ASCII")); crc.update(data)
    val out = new java.io.ByteArrayOutputStream()
    val iendOffset = png.length - 12 // IEND is the final 12 bytes
    out.write(png, 0, iendOffset)
    val len = data.length
    out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
      (len >>> 8).toByte, len.toByte))
    out.write("tEXt".getBytes("US-ASCII")); out.write(data)
    val c = crc.getValue
    out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte,
      (c >>> 8).toByte, c.toByte))
    out.write(png, iendOffset, 12)
    out.toByteArray
  }

  /** Splice a skippable LIST chunk between fmt and data (RIFF walk
    * must skip it): container bytes change, the waveform does not. */
  private def wavWithExtraChunk(wav: Array[Byte]): Array[Byte] = {
    val extra = Array[Byte]('L', 'I', 'S', 'T', 4, 0, 0, 0, 'I', 'N', 'F', 'O')
    val out = new Array[Byte](wav.length + extra.length)
    System.arraycopy(wav, 0, out, 0, 36) // RIFF header + fmt chunk
    System.arraycopy(extra, 0, out, 36, extra.length)
    System.arraycopy(wav, 36, out, 36 + extra.length, wav.length - 36)
    val riffLen = (wav.length - 8) + extra.length
    out(4) = riffLen.toByte; out(5) = (riffLen >>> 8).toByte
    out(6) = (riffLen >>> 16).toByte; out(7) = (riffLen >>> 24).toByte
    out
  }

  test("embed derives from the DECODED tensor: container-variant " +
      "payloads embed identically; a content change moves the embedding") {
    // image: same pixels, different container bytes (ancillary chunk)
    val png = ImageCodec.pngBytesOf(20, 14,
      (x, y) => ((x * 7 + y * 13) % 251).toByte)
    val png2 = pngWithAncillaryChunk(png)
    assert(!java.util.Arrays.equals(png, png2))
    assert(ImageCodec.pngPixels(png2).isDefined, "variant must still decode")
    assert(Multimodal.embed(png).toSeq === Multimodal.embed(png2).toSeq)
    // one-pixel content change must move the embedding
    val png3 = ImageCodec.pngBytesOf(20, 14, (x, y) =>
      (((x * 7 + y * 13) % 251) + (if (x == 0 && y == 0) 50 else 0)).toByte)
    assert(Multimodal.embed(png).toSeq !== Multimodal.embed(png3).toSeq)

    // audio: same waveform, extra skippable RIFF chunk
    val wav = AudioCodec.wavBytes(8000, 500, 7L)
    val wav2 = wavWithExtraChunk(wav)
    assert(!java.util.Arrays.equals(wav, wav2))
    assert(AudioCodec.pcm8(wav2).isDefined, "variant must still decode")
    assert(Multimodal.embed(wav).toSeq === Multimodal.embed(wav2).toSeq)

    // video: same luma frames, different fps header tag
    val frames = (0 until 3).map(f =>
      Array.tabulate(16 * 12)(i => ((i * 3 + f * 11) % 251).toByte))
    val v1 = VideoCodec.y4mBytes(16, 12, 25, 1, frames)
    val v2 = VideoCodec.y4mBytes(16, 12, 30, 1, frames)
    assert(!java.util.Arrays.equals(v1, v2))
    assert(Multimodal.embed(v1).toSeq === Multimodal.embed(v2).toSeq)
  }

  test("embed is bit-reproducible across partitionings (pure per-row map)") {
    val media = Multimodal.mediaFromDocs(spark, sfDir)
    val a = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    val b = Multimodal.extractFeatures(media.repartition(13)).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(a.nonEmpty)
    assert(a === b)
  }
}
