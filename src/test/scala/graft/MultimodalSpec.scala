package graft

import graft.ops.Multimodal

/** Binary-column multimodal plumbing (stubbed codec, real dataflow). */
class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "a much longer payload body for frames"),
      (3L, "x")).toDF("doc_id", "text")
    Multimodal.attachBinary(df, "doc_id", "text", "text/plain")
  }

  test("attachBinary: payload bytes + typed metadata struct") {
    import spark.implicits._
    assert(media.schema("payload").dataType.typeName == "binary")
    val row = media.filter($"media_id" === 1L).select($"payload", $"meta.n_bytes", $"meta.mime").collect().head
    assert(new String(row.getAs[Array[Byte]](0), "UTF-8") == "hello world")
    assert(row.getLong(1) == 11L)
    assert(row.getString(2) == "text/plain")
  }

  test("decode: deterministic stub, fixed feature dim, one row per media") {
    val d1 = Multimodal.decode(media, featureDim = 16).collect().sortBy(_.media_id)
    val d2 = Multimodal.decode(media, featureDim = 16).collect().sortBy(_.media_id)
    assert(d1.length == 3)
    assert(d1.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    d1.zip(d2).foreach { case (a, b) =>
      assert(a.width == b.width && a.height == b.height)
      assert(a.features.toSeq == b.features.toSeq)
      assert(a.features.length == 16)
    }
  }

  test("resize: caps the max dimension, preserves aspect floor of 1") {
    val resized = Multimodal.resize(Multimodal.decode(media), maxDim = 8).collect()
    resized.foreach { d =>
      assert(math.max(d.width, d.height) <= 8 && math.min(d.width, d.height) >= 1)
    }
  }

  test("imageDims parses real PNG/JPEG/GIF headers; junk and truncation yield None") {
    // hand-built VALID format headers (public specs: PNG RFC 2083, JPEG
    // ISO/IEC 10918 marker structure, GIF89a spec)
    def png(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(24)
      b.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      b.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
      b.array()
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(2 + 4 + 16 + 2 + 9)
      b.put(Array(0xff, 0xd8).map(_.toByte))                    // SOI
      b.put(Array(0xff, 0xe0).map(_.toByte)).putShort(18)       // APP0, len 18
      b.put(new Array[Byte](16))                                //   JFIF payload
      b.put(Array(0xff, 0xc0).map(_.toByte)).putShort(9)        // SOF0, len
      b.put(8.toByte).putShort(h.toShort).putShort(w.toShort)   // precision, H, W
      b.array()
    }
    def gif(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("GIF89a".getBytes("US-ASCII")).putShort(w.toShort).putShort(h.toShort)
      b.array()
    }
    assert(Multimodal.imageDims(png(640, 480)) == Some(("png", 640, 480)))
    assert(Multimodal.imageDims(jpeg(1024, 768)) == Some(("jpeg", 1024, 768)))
    assert(Multimodal.imageDims(gif(320, 200)) == Some(("gif", 320, 200)))
    assert(Multimodal.imageDims("not an image".getBytes) == None)
    assert(Multimodal.imageDims(png(640, 480).take(10)) == None) // truncated
    assert(Multimodal.imageDims(Array[Byte]()) == None)

    // the DataFrame stage: real dims out, NULLs for unknown payloads
    import spark.implicits._
    val rows = Seq(
      (1L, png(8, 16)), (2L, gif(3, 4)), (3L, "junk".getBytes)
    ).toDF("media_id", "payload")
    val out = Multimodal.imageDimensions(rows).orderBy("media_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSeq
    assert(out == Seq(
      (1L, Some("png"), Some(8)), (2L, Some("gif"), Some(3)), (3L, None, None)))
  }

  test("decodePixels: REAL codec round-trip reproduces the planted closed form exactly") {
    // r12 verdict item #3: pixel decode is no longer stubbed — the JRE
    // ships java.desktop, so syntheticPng runs the actual PNG WRITER and
    // decodePixels the actual PNG READER. PNG is lossless, so the decoded
    // stats must equal the generation formula bit-for-bit; any defect in
    // pixel order, color model, stride, or dims breaks the equality.
    for (id <- Seq(0L, 1L, 7L, 123L, 4999L)) {
      val w = (8 + id % 9).toInt; val h = (8 + (id * 7) % 9).toInt
      val stats = Multimodal.decodePixels(Multimodal.syntheticPng(id, w, h))
        .getOrElse(fail(s"decode failed for id=$id"))
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sr += (3L * x + 5L * y + id) % 256
        sg += (11L * x + y + 2L * id) % 256
        sb += (x + 13L * y + 3L * id) % 256
      }
      assert(stats == Multimodal.PixelStats(w, h, sr, sg, sb,
        299L * sr + 587L * sg + 114L * sb), s"id=$id")
    }
    // undecodable payloads are data, not exceptions
    assert(Multimodal.decodePixels("junk, not an image".getBytes) == None)
    assert(Multimodal.decodePixels(Array[Byte]()) == None)
    // a TRUNCATED png must not throw either (covers the IOException path)
    val whole = Multimodal.syntheticPng(3L, 9, 9)
    assert(Multimodal.decodePixels(whole.take(whole.length / 2)).isEmpty)
  }

  test("pixelStats stage: decoded dims agree with header parsing; NULLs for junk") {
    import spark.implicits._
    val rows = Seq(
      (1L, Multimodal.syntheticPng(1L, 9, 15)),
      (2L, Multimodal.syntheticPng(2L, 10, 13)),
      (3L, "junk".getBytes)
    ).toDF("media_id", "payload")
    val out = Multimodal.pixelStats(rows).orderBy("media_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(out == Seq((1L, 9L, 15L), (2L, 10L, 13L), (3L, -1L, -1L)))
    // the raster dims and the header-arithmetic dims must agree — two
    // independent implementations of "how big is this image"
    val hdr = Multimodal.imageDimensions(rows).orderBy("media_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getInt(2).toLong,
        if (r.isNullAt(3)) -1L else r.getInt(3).toLong)).toSeq
    assert(hdr == out, s"header dims $hdr != raster dims $out")
  }

  test("resizePixels: nearest-neighbor index map replayed exactly; degenerate inputs → None") {
    // resize(planted png) decoded again must equal the plant formula at
    // src = dst·srcDim DIV dstDim — the same closed form x193's DuckDB
    // oracle evaluates
    val id = 42L; val w = 14; val h = 9
    val resized = Multimodal.resizePixels(Multimodal.syntheticPng(id, w, h), 5, 3)
      .getOrElse(fail("resize failed"))
    val stats = Multimodal.decodePixels(resized).getOrElse(fail("re-decode failed"))
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until 3; x <- 0 until 5) {
      val sx = x * w / 5; val sy = y * h / 3
      sr += (3L * sx + 5L * sy + id) % 256
      sg += (11L * sx + sy + 2L * id) % 256
      sb += (sx + 13L * sy + 3L * id) % 256
    }
    assert(stats == Multimodal.PixelStats(5, 3, sr, sg, sb,
      299L * sr + 587L * sg + 114L * sb))
    assert(Multimodal.resizePixels("junk".getBytes, 5, 3).isEmpty)
    assert(Multimodal.resizePixels(Multimodal.syntheticPng(1L, 8, 8), 0, 3).isEmpty)
    // within-budget images pass through the STAGE unchanged (no re-encode)
    import spark.implicits._
    val small = Multimodal.syntheticPng(7L, 4, 4)
    val out = Multimodal.resizeImages(
      Seq((7L, small)).toDF("media_id", "payload"), maxDim = 5).collect()(0)
    assert(java.util.Arrays.equals(out.getAs[Array[Byte]]("payload"), small))
  }

  test("frameCount: decoded-truth GIF frame counts; non-media → NULL") {
    for (n <- Seq(1, 2, 4, 7))
      assert(Multimodal.frameCount(Multimodal.syntheticGif(n.toLong, n)) == Some(n),
        s"n=$n")
    // single-frame formats count as 1; junk counts as None
    assert(Multimodal.frameCount(Multimodal.syntheticPng(1L, 8, 8)) == Some(1))
    assert(Multimodal.frameCount("not media".getBytes) == None)
    import spark.implicits._
    val media = Seq(
      (1L, Multimodal.syntheticGif(1L, 3)),
      (2L, "junk".getBytes)
    ).toDF("media_id", "payload")
    val rows = Multimodal.frameCounts(media).orderBy("media_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(rows == Seq((1L, 3L), (2L, -1L)))
  }

  test("NULL payloads flow through every codec stage as data (the resize→stats composition)") {
    // r13 review finding: resizeImages documents emitting NULL payloads for
    // undecodable inputs, so every downstream kernel must treat NULL as
    // data — the composition x193 makes must not NPE on one junk row.
    assert(Multimodal.decodePixels(null) == None)
    assert(Multimodal.resizePixels(null, 4, 4) == None)
    assert(Multimodal.frameCount(null) == None)
    assert(Multimodal.decodeAudio(null) == None)
    import spark.implicits._
    val mixed = Seq(
      (1L, Multimodal.syntheticPng(1L, 12, 8)),
      (2L, "junk that decodes to a NULL payload in resize".getBytes)
    ).toDF("media_id", "payload")
    val out = Multimodal.pixelStats(Multimodal.resizeImages(mixed, maxDim = 5))
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(out == Seq((1L, 5L, 3L), (2L, -1L, -1L)), out.toString)
  }

  test("decodeAudio: WAV PCM round trip reproduces the planted closed form; junk → None") {
    for (id <- Seq(0L, 7L, 4999L)) {
      val n = (500 + id % 300).toInt
      val stats = Multimodal.decodeAudio(Multimodal.syntheticWav(id, n))
        .getOrElse(fail(s"decode failed id=$id"))
      var sum = 0L; var sumAbs = 0L; var maxAbs = 0L
      for (i <- 0 until n) {
        val s = ((31L * i + 17L * id) % 65536) - 32768
        sum += s; sumAbs += math.abs(s); maxAbs = math.max(maxAbs, math.abs(s))
      }
      assert(stats == Multimodal.AudioStats(1, 8000, n, sum, sumAbs, maxAbs), s"id=$id")
    }
    assert(Multimodal.decodeAudio("not audio".getBytes) == None)
    assert(Multimodal.decodeAudio(Array[Byte]()) == None)
    val whole = Multimodal.syntheticWav(3L, 600)
    // truncating INSIDE the data chunk must not throw (reader returns what
    // framing allows; the stage's contract is no-exceptions, stats-or-NULL)
    Multimodal.decodeAudio(whole.take(50)) // must simply not throw
    import spark.implicits._
    val media = Seq(
      (1L, Multimodal.syntheticWav(1L, 100)),
      (2L, "junk".getBytes)
    ).toDF("media_id", "payload")
    val out = Multimodal.audioStats(media).orderBy("media_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(out == Seq((1L, 100L), (2L, -1L)))
  }

  test("decode stage is codec-first: real dims/frames/histogram for images, stub otherwise") {
    import spark.implicits._
    val rows = Seq(
      (1L, Multimodal.syntheticPng(5L, 9, 12)),
      (2L, Multimodal.syntheticGif(2L, 3)),
      (3L, "plain text payload, no codec reads this".getBytes)
    ).toDF("media_id", "payload")
    val out = Multimodal.decode(rows, featureDim = 8).collect()
      .map(d => d.media_id -> d).toMap
    assert(out(1L).width == 9 && out(1L).height == 12 && out(1L).n_frames == 1)
    assert(out(2L).width == 4 && out(2L).height == 4 && out(2L).n_frames == 3,
      s"gif: ${out(2L)}")
    // image features are a luma histogram: fractions summing to ~1
    assert(math.abs(out(1L).features.sum - 1.0f) < 1e-3, out(1L).features.toSeq.toString)
    // non-media payloads replay the documented stub exactly
    val payload3 = "plain text payload, no codec reads this".getBytes
    val (w, h, f, feats) = Multimodal.decodeStub(payload3, 8)
    assert(out(3L).width == w && out(3L).height == h && out(3L).n_frames == f &&
      out(3L).features.toSeq == feats.toSeq)
  }

  test("codecSupport: format sniff + decode mode earned by the real decoders") {
    import spark.implicits._
    // one payload per contract row: real codecs, compressed formats with
    // VALID headers (duration from pure header arithmetic) and with junk
    // bodies (stub), a truncated stream, a NULL marker, a text stand-in
    val png = Multimodal.syntheticPng(7L, 8, 8)
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> png,
      2L -> Multimodal.syntheticGif(2L, 3),
      3L -> Multimodal.syntheticWav(3L, 50),
      4L -> ("ID3".getBytes("US-ASCII") ++ Array.fill[Byte](32)(9)),
      5L -> (Array[Byte](0, 0, 0, 40) ++ "ftypisom".getBytes("US-ASCII") ++
        Array.fill[Byte](16)(3)),
      6L -> png.take(26),
      7L -> null,
      8L -> "plain text payload".getBytes("US-ASCII"),
      9L -> Multimodal.syntheticMp3(9L, 4),
      10L -> Multimodal.syntheticMp4(10L, 1234L))
    val got = Multimodal.codecSupport(rows.toDF("media_id", "payload"))
      .as[(Long, String, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ("png", "real", None))
    assert(got(2L) == ("gif", "real", None))
    // 50 mono samples at 8 kHz — duration from the REAL decode: 6.25 → 6 ms
    assert(got(3L) == ("wav", "real", Some(6L)))
    // ID3 magic with no parseable frame / ftyp with no mvhd: still stubs
    assert(got(4L) == ("mp3", "stub", None), s"mp3 junk: ${got(4L)}")
    assert(got(5L) == ("mp4", "stub", None), s"mp4 junk: ${got(5L)}")
    assert(got(6L) == ("png", "header_only", None), s"truncated png: ${got(6L)}")
    assert(got(7L) == ("unknown", "null", None))
    assert(got(8L) == ("unknown", "stub", None))
    // valid compressed headers: no JDK codec, but the duration IS header math
    assert(got(9L) == ("mp3", "header_only", Some(96L)), s"valid mp3: ${got(9L)}")
    assert(got(10L) == ("mp4", "header_only", Some(1234L)), s"valid mp4: ${got(10L)}")
  }

  test("mp3 header walk: frame counting, truncation, and corrupt-header edges") {
    // the plant: 26-byte ID3 tag + n 384-byte frames of 1152 samples @48kHz
    val full = Multimodal.syntheticMp3(3L, 5)
    val info = Multimodal.mp3HeaderInfo(full).get
    assert(info == Multimodal.Mp3Info(48000, 5, 120L), s"$info")
    // truncation mid-frame: only COMPLETE frames count
    val cut = full.take(full.length - 100)
    assert(Multimodal.mp3HeaderInfo(cut).contains(Multimodal.Mp3Info(48000, 4, 96L)))
    // truncation inside the FIRST frame: no complete frame → None
    assert(Multimodal.mp3HeaderInfo(full.take(26 + 100)).isEmpty)
    // corrupt first header: bad bitrate index (0xF) → None
    val bad = full.clone(); bad(28) = 0xf4.toByte
    assert(Multimodal.mp3HeaderInfo(bad).isEmpty)
    // malformed syncsafe tag size (high bit set) → None, not a crash
    val badTag = full.clone(); badTag(6) = 0x80.toByte
    assert(Multimodal.mp3HeaderInfo(badTag).isEmpty)
    // a bare frame train with NO ID3 tag parses too
    assert(Multimodal.mp3HeaderInfo(full.drop(26))
      .contains(Multimodal.Mp3Info(48000, 5, 120L)))
    // trailing junk after the last full frame is tolerated
    assert(Multimodal.mp3HeaderInfo(full ++ Array[Byte](1, 2, 3))
      .contains(Multimodal.Mp3Info(48000, 5, 120L)))
    assert(Multimodal.mp3HeaderInfo(null).isEmpty)
    assert(Multimodal.mp3HeaderInfo(Array[Byte]('I', 'D', '3')).isEmpty)
  }

  test("mp4 header walk: mvhd v0/v1, truncation, and malformed boxes") {
    val full = Multimodal.syntheticMp4(5L, 2500L)
    assert(Multimodal.mp4HeaderInfo(full)
      .contains(Multimodal.Mp4Info(1000L, 2500L, 2500L)))
    // a version-1 mvhd (64-bit times/duration) built by hand: timescale
    // 90000, duration 180000 ticks → 2000 ms
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val mvhd1 = be32(8 + 4 + 8 + 8 + 4 + 8 + 80) ++ "mvhd".getBytes("US-ASCII") ++
      Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
      be32(90000L) ++ be32(0L) ++ be32(180000L) ++ new Array[Byte](80)
    val v1 = be32(16) ++ "ftypisom".getBytes("US-ASCII") ++ be32(0) ++
      be32(8 + mvhd1.length) ++ "moov".getBytes("US-ASCII") ++ mvhd1
    assert(Multimodal.mp4HeaderInfo(v1)
      .contains(Multimodal.Mp4Info(90000L, 180000L, 2000L)), s"${Multimodal.mp4HeaderInfo(v1)}")
    // truncated inside moov (mvhd cut short) → None, not a crash
    assert(Multimodal.mp4HeaderInfo(full.take(full.length - 60)).isEmpty)
    // box size pointing past the buffer → None
    val overflow = full.clone(); overflow(16) = 0x7f.toByte
    assert(Multimodal.mp4HeaderInfo(overflow).isEmpty)
    // zero timescale → None (no division). Offset 44 = ftyp(16) +
    // moov header(8) + mvhd header(8) + version/flags+times(12).
    val zeroTs = full.clone()
    var i = 0
    while (i < 4) { zeroTs(44 + i) = 0; i += 1 }
    assert(Multimodal.mp4HeaderInfo(zeroTs).isEmpty)
    assert(Multimodal.mp4HeaderInfo(null).isEmpty)
    // a v1 duration past Long.MaxValue/1000 (8 attacker-controlled bytes)
    // must be malformed-data → None, not a wrapped/negative duration_ms
    val mvhdHuge = be32(8 + 4 + 8 + 8 + 4 + 8 + 80) ++ "mvhd".getBytes("US-ASCII") ++
      Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
      be32(90000L) ++ be32(1L << 28) ++ be32(0L) ++ new Array[Byte](80) // dur = 2^60
    val huge = be32(16) ++ "ftypisom".getBytes("US-ASCII") ++ be32(0) ++
      be32(8 + mvhdHuge.length) ++ "moov".getBytes("US-ASCII") ++ mvhdHuge
    assert(Multimodal.mp4HeaderInfo(huge).isEmpty)
  }

  // dHash truth from the closed form DIRECTLY — no codec, no call into the
  // code under test: an independent replay of grid sampling + luma + bits,
  // the same computation the x200 SQL oracle runs.
  private def dhashTruth(id: Long, variant: Boolean): Long = {
    val w = (8 + id % 9).toInt
    val h = (8 + (id * 7) % 9).toInt
    def luma(gx: Int, gy: Int): Long = {
      val sx = gx.toLong * w / 9
      val sy = gy.toLong * h / 8
      val r = ((sx * sy + 3 * sx + 5 * sy) * (1 + id % 97) + id) % 256
      val bump = if (variant && sx == 2 && sy == 3) 128 else 0
      val g = (((2 * sx * sy + 11 * sx + sy) * (1 + id % 89) + 2 * id) % 256 + bump) % 256
      val b = ((3 * sx * sy + sx + 13 * sy) * (1 + id % 83) + 3 * id) % 256
      299 * r + 587 * g + 114 * b
    }
    (for (y <- 0 until 8; x <- 0 until 8 if luma(x + 1, y) > luma(x, y))
      yield 1L << (y * 8 + x)).foldLeft(0L)(_ | _)
  }

  test("dhash64: codec round trip lands on the closed-form hash; junk/null → None") {
    for (id <- 0L until 40L) {
      val w = (8 + id % 9).toInt
      val h = (8 + (id * 7) % 9).toInt
      assert(Multimodal.dhash64(Multimodal.syntheticPngPair(id, w, h, variant = false))
        .contains(dhashTruth(id, variant = false)), s"base id=$id")
      assert(Multimodal.dhash64(Multimodal.syntheticPngPair(id, w, h, variant = true))
        .contains(dhashTruth(id, variant = true)), s"variant id=$id")
    }
    assert(Multimodal.dhash64(null).isEmpty)
    assert(Multimodal.dhash64(Array[Byte](1, 2, 3)).isEmpty)
    // a truncated PNG: real magic, unreadable body
    assert(Multimodal.dhash64(
      Multimodal.syntheticPngPair(5L, 8, 8, variant = false).take(20)).isEmpty)
    // brightness invariance — the property that makes gradient-sign bits a
    // perceptual hash: a global +1 shift on every channel moves every
    // sampled luma by the same 299+587+114, flipping no comparison
    val img = new java.awt.image.BufferedImage(10, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val img2 = new java.awt.image.BufferedImage(10, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 10) {
      val v = (x * 37 + y * 91) % 200 // headroom so +1 can't clip at 255
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
      img2.setRGB(x, y, ((v + 1) << 16) | ((v + 1) << 8) | (v + 1))
    }
    def png(i: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, "png", bos); bos.toByteArray
    }
    assert(Multimodal.dhash64(png(img)) == Multimodal.dhash64(png(img2)))
  }

  test("imageNearDupPairs == brute-force hamming truth; undecodables drop; NULL sigs surface in imageDhash") {
    import spark.implicits._
    val n = 60
    val planted = Multimodal.plantSyntheticPngPairs(
      spark.range(n).toDF("doc_id"), "doc_id")
    // one undecodable payload riding along — must vanish from pairs but
    // surface as a NULL signature in the imageDhash inventory
    val junk = Seq((5000000L, Array[Byte](9, 9, 9))).toDF("media_id", "payload")
    val media = planted.unionAll(junk)
    val got = Multimodal.imageNearDupPairs(media, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    // truth: all pairs over the closed-form hashes (no codec, no LSH)
    val sigs = (0L until n).flatMap(id =>
      Seq(id -> dhashTruth(id, variant = false),
          (id + 1000000L) -> dhashTruth(id, variant = true)))
    val truth = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      hm = java.lang.Long.bitCount(sa ^ sb) if hm <= 3
    } yield (ia, ib, hm)).toSet
    assert(got == truth)
    // every planted base/variant pair is found (measured contract: the
    // one-pixel edit stays within hamming 2 on this family)
    assert((0L until n).forall(id => got.exists(p => p._1 == id && p._2 == id + 1000000L)))
    val dh = Multimodal.imageDhash(media).collect()
    assert(dh.length == 2 * n + 1)
    assert(dh.filter(_.isNullAt(1)).map(_.getLong(0)).toSeq == Seq(5000000L))
  }

  test("clip near-dup: planted GIF pairs found at 2/3 shared frames; codec round trip lossless") {
    import spark.implicits._
    val ids = (0L until 6L).toDF("doc_id")
    val clips = Multimodal.plantSyntheticGifClips(ids, "doc_id", frames = 6, variantFrame = 2)
    // sampled frames 0/2/4 per clip; base and variant share {0, 4} exactly
    val frames = Multimodal.clipFrameDhashes(clips, sampleEvery = 2)
      .as[(Long, Int, Long)].collect()
    assert(frames.length == 12 * 3)
    val byClip = frames.groupBy(_._1).view.mapValues(_.map(f => f._2 -> f._3).toMap).toMap
    (0L until 6L).foreach { id =>
      val b = byClip(id); val v = byClip(id + 1000000L)
      assert(b(0) == v(0) && b(4) == v(4),
        s"shared frames must round-trip to identical hashes for id=$id")
      assert(b(2) != v(2), s"the replaced frame must differ for id=$id")
    }
    val got = Multimodal.clipNearDupPairs(clips, sampleEvery = 2,
      maxHamming = 3, minSharePpm = 500000L)
      .select($"clip_a", $"clip_b", $"n_frame_pairs", $"shared_ppm")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == (0L until 6L).map(id => (id, id + 1000000L, 2L, 666666L)),
      s"expected exactly the planted pairs at 2/3 shared: $got")
    // junk payloads drop out of the frame relation (no signature, no pair)
    val withJunk = clips.unionByName(
      Seq((9000000L, Array[Byte](1, 2, 3))).toDF("media_id", "payload"))
    assert(Multimodal.clipFrameDhashes(withJunk, 2)
      .filter($"media_id" === 9000000L).isEmpty)
    // composite-id decode stays exact beyond 2^53 (integer DIV, not double
    // division — clip·2^20 + frame at a 10-billion clip id is ~1.05e16)
    val big = Multimodal.plantSyntheticGifClips(
      Seq(10000000000L).toDF("doc_id"), "doc_id", frames = 6, variantFrame = 2)
    val bigPairs = Multimodal.clipNearDupPairs(big, sampleEvery = 2)
      .select($"clip_a", $"clip_b").as[(Long, Long)].collect().toSeq
    assert(bigPairs == Seq((10000000000L, 10001000000L)),
      s"huge composite ids must decode exactly: $bigPairs")
    // the composite-id precondition is ENFORCED, not just documented (r16
    // ADVICE): a media_id past Long.Max/frameStride would silently alias
    // onto another clip's composite range — it must fail loudly instead
    val tooBig = Multimodal.plantSyntheticGifClips(
      Seq(Long.MaxValue / (1L << 20)).toDF("doc_id"), "doc_id",
      frames = 6, variantFrame = 2)
    val ex = intercept[Exception] {
      Multimodal.clipNearDupPairs(tooBig, sampleEvery = 2).collect()
    }
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null && !String.valueOf(c.getMessage).contains("overflow"))
        c = c.getCause
      String.valueOf(c.getMessage)
    }
    assert(rootMsg(ex).contains("composite id would overflow"),
      s"expected the overflow guard, got: ${rootMsg(ex)}")
    // the documented remedy actually works: a SMALLER stride re-admits the
    // large id (6 frames per clip need only stride > 5)
    val rescued = Multimodal.clipNearDupPairs(
      tooBig, sampleEvery = 2, frameStride = 64L)
      .select($"clip_a", $"clip_b").as[(Long, Long)].collect().toSeq
    assert(rescued.length == 1, s"smaller stride must rescue large ids: $rescued")
  }

  test("sampleFrames: stride-2 generator over n_frames") {
    import spark.implicits._
    val decoded = Multimodal.decode(media)
    val frames = Multimodal.sampleFrames(decoded, stride = 2)
      .select($"media_id", $"frame_idx").as[(Long, Int)].collect()
    val nFrames = decoded.collect().map(d => d.media_id -> d.n_frames).toMap
    frames.groupBy(_._1).foreach { case (id, fs) =>
      val expected = (0 until nFrames(id) by 2).toSeq
      assert(fs.map(_._2).sorted.toSeq == expected, s"media $id")
    }
  }
}
