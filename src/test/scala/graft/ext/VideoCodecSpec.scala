package graft.ext

/** The featurizer's REAL video container lane: synthetic RIFF/AVI
  * payloads parse with exact header metadata and per-frame identity
  * hashes; malformed or non-AVI payloads fall back to the md5 stub
  * without crashing the task.
  */
class VideoCodecSpec extends graft.SparkSpec {
  import spark.implicits._

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(fourcc.getBytes("US-ASCII"))
    out.write(le32(data.length))
    out.write(data)
    if (data.length % 2 == 1) out.write(0) // RIFF chunks pad to even
    out.toByteArray
  }

  private def list(listType: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("LIST".getBytes("US-ASCII"))
    out.write(le32(body.length + 4))
    out.write(listType.getBytes("US-ASCII"))
    out.write(body)
    out.toByteArray
  }

  /** Minimal standard-layout AVI: hdrl(avih) + movi(frame chunks). */
  private def avi(
      width: Int,
      height: Int,
      microsPerFrame: Long,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val avihData = new java.io.ByteArrayOutputStream()
    avihData.write(le32(microsPerFrame)) // dwMicroSecPerFrame
    avihData.write(le32(0)); avihData.write(le32(0)); avihData.write(le32(0))
    avihData.write(le32(frames.length)) // dwTotalFrames
    avihData.write(le32(0)); avihData.write(le32(1)); avihData.write(le32(0))
    avihData.write(le32(width)) // dwWidth
    avihData.write(le32(height)) // dwHeight
    (0 until 4).foreach(_ => avihData.write(le32(0)))
    val hdrl = list("hdrl", chunk("avih", avihData.toByteArray))
    val moviBody = new java.io.ByteArrayOutputStream()
    frames.zipWithIndex.foreach { case (f, i) =>
      moviBody.write(chunk(if (i % 2 == 0) "00db" else "00dc", f))
    }
    val movi = list("movi", moviBody.toByteArray)
    val junk = chunk("JUNK", Array.fill[Byte](6)(0x55))
    val body = hdrl ++ junk ++ movi
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(body.length + 4))
    out.write("AVI ".getBytes("US-ASCII"))
    out.write(body)
    out.toByteArray
  }

  private val md = java.security.MessageDigest.getInstance("MD5")

  test("synthetic AVI: exact header metadata and per-frame hashes") {
    // odd-length frame 1 exercises the even-padding rule: frame 2 must
    // still be found at the padded offset
    val frames = Seq(
      "frame-zero".getBytes("UTF-8"),
      "frame-one-odd".getBytes("UTF-8"), // 13 bytes -> pad
      "frame-two".getBytes("UTF-8"))
    val payload = avi(320, 240, 40000L, frames)
    val r = Multimodal
      .extractVideoFeatures(Seq((1L, payload)).toDF("doc_id", "payload"))
      .collect().head
    assert(r.decoded && r.width == 320 && r.height == 240)
    assert(r.micros_per_frame == 40000L && r.total_frames == 3L && r.n_frame_chunks == 3L)
    val expected = frames.map(f => Multimodal.portableHash60(md, f.toArray))
    assert(r.frame_hashes.toSeq == expected)
  }

  test("frames inside 'rec ' LIST groups come out in file order") {
    // interleaved-AVI layout: movi nests frames in rec groups — the walk
    // must emit them depth-first at their file positions (a LIFO-deferred
    // walk emitted group contents late and multiple groups reversed)
    val f = (0 until 4).map(i => s"frame-$i".getBytes("UTF-8"))
    val moviBody =
      list("rec ", chunk("00dc", f(0)) ++ chunk("00dc", f(1))) ++
        list("rec ", chunk("00dc", f(2))) ++
        chunk("00db", f(3)) // bare frame after the groups
    val avihData = new java.io.ByteArrayOutputStream()
    avihData.write(le32(1000L))
    avihData.write(le32(0)); avihData.write(le32(0)); avihData.write(le32(0))
    avihData.write(le32(4))
    avihData.write(le32(0)); avihData.write(le32(1)); avihData.write(le32(0))
    avihData.write(le32(64)); avihData.write(le32(48))
    (0 until 4).foreach(_ => avihData.write(le32(0)))
    val body = list("hdrl", chunk("avih", avihData.toByteArray)) ++
      list("movi", moviBody)
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(body.length + 4))
    out.write("AVI ".getBytes("US-ASCII"))
    out.write(body)
    val m = Multimodal.parseAvi(out.toByteArray).get
    assert(m.frames.length == 4)
    val got = m.frames.map { case (off, len) =>
      new String(out.toByteArray.slice(off, off + len), "UTF-8")
    }.toSeq
    assert(got == Seq("frame-0", "frame-1", "frame-2", "frame-3"))
  }

  test("frameless-but-valid AVI still contributes one whole-payload hash") {
    val payload = avi(8, 8, 1000L, Seq.empty)
    val r = Multimodal
      .extractVideoFeatures(Seq((1L, payload)).toDF("doc_id", "payload"))
      .collect().head
    assert(r.decoded && r.n_frame_chunks == 0L)
    assert(r.frame_hashes.toSeq == Seq(Multimodal.portableHash60(md, payload)))
  }

  test("frame sampling is even and bounded by maxFrames") {
    val frames = (0 until 10).map(i => s"f$i".getBytes("UTF-8"))
    val payload = avi(16, 16, 1000L, frames)
    val r = Multimodal
      .extractVideoFeatures(Seq((1L, payload)).toDF("doc_id", "payload"), maxFrames = 4)
      .collect().head
    assert(r.n_frame_chunks == 10L && r.frame_hashes.length == 4)
    // indices i*10/4 = 0, 2, 5, 7
    val expected = Seq(0, 2, 5, 7).map(i => Multimodal.portableHash60(md, frames(i).toArray))
    assert(r.frame_hashes.toSeq == expected)
  }

  test("non-AVI and malformed payloads fall back to the stub, flagged") {
    val junk = "not a video".getBytes("UTF-8")
    // declared chunk size overruns the payload: the walk must stop, not read past
    val truncated = avi(8, 8, 1000L, Seq("frame".getBytes("UTF-8"))).dropRight(10) ++
      Array.fill[Byte](2)(0x7f)
    val rows = Multimodal
      .extractVideoFeatures(Seq((1L, junk), (2L, truncated)).toDF("doc_id", "payload"))
      .collect().map(r => r.doc_id -> r).toMap
    assert(!rows(1L).decoded && rows(1L).width == -1)
    assert(rows(1L).frame_hashes.toSeq == Seq(Multimodal.portableHash60(md, junk)))
    // the truncated AVI still has a complete avih: decoded, zero frames
    // short of the cut — either outcome is fine as long as no crash and
    // the contract (spans within payload) holds
    assert(rows(2L).byte_len == truncated.length)
  }

  test("parseAvi never throws on arbitrary bytes (fuzz, incl. RIFF-prefixed)") {
    val rnd = new scala.util.Random(31415)
    (1 to 500).foreach { i =>
      val len = rnd.nextInt(200)
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      // half the cases: force plausible RIFF/AVI magic so the walker runs
      if (i % 2 == 0 && len >= 12) {
        "RIFF".getBytes("US-ASCII").copyToArray(b, 0)
        "AVI ".getBytes("US-ASCII").copyToArray(b, 8)
      }
      Multimodal.parseAvi(b) // must return, not throw
    }
    // adversarial declared sizes: negative-as-unsigned and max-u32 chunk
    // sizes inside a valid RIFF envelope must terminate without reading
    // out of bounds
    val evil = "RIFF".getBytes("US-ASCII") ++ le32(0xffffffffL) ++
      "AVI ".getBytes("US-ASCII") ++ "avih".getBytes("US-ASCII") ++
      le32(0xfffffff0L) ++ Array.fill[Byte](8)(1)
    assert(Multimodal.parseAvi(evil).isEmpty)
  }

  test("mixed corpus routes video rows to the codec lane only") {
    val v = avi(4, 4, 1000L, Seq("x".getBytes("UTF-8")))
    val rows = Seq((1L, v), (2L, "text doc".getBytes("UTF-8")))
    val got = Multimodal
      .extractVideoFeatures(rows.toDF("doc_id", "payload"))
      .collect().map(r => r.doc_id -> r.decoded).toMap
    assert(got == Map(1L -> true, 2L -> false))
  }

  // ---- pixel decode (extractVideoPixelFeatures / decodeVideoFrame) ----

  /** A deterministic W×H raster: pixel (x,y) = RGB gradient. */
  private def gradient(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 16 % 256) << 16) | ((y * 32 % 256) << 8) | ((x + y) * 8 % 256))
    img
  }

  private def jpegBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("MJPEG-in-AVI: pixel decode through the container equals direct ImageIO decode") {
    val rasters = Seq(gradient(16, 12), gradient(16, 12))
    val frames = rasters.map(jpegBytes)
    val payload = Multimodal.syntheticAvi(16, 12, 40000L, frames, compressed = true)
    val r = Multimodal
      .extractVideoPixelFeatures(Seq((1L, payload)).toDF("doc_id", "payload"), bins = 4)
      .collect().head
    assert(r.decoded && r.n_decoded_frames == 2L && r.undecoded_hashes.isEmpty)
    // pixel-exact: the per-frame histograms must match histograms of the
    // SAME jpeg bytes decoded directly (JPEG is lossy at encode time, but
    // decode of given bytes is deterministic)
    val expect = frames
      .map(b => Multimodal.imageHistogramCounts(
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)), 4))
      .reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
    assert(r.hist.toSeq == expect.toSeq)
    assert(r.hist.sum == 2L * 16 * 12 * 3) // every pixel counted once per channel
  }

  test("raw DIB frame: bottom-up BGR decode is pixel-exact, tight and padded strides") {
    // 2×2 tight=6 bytes/row is NOT DWORD-aligned → exercises the padded
    // form too. Raster rows in DIB order (bottom row first), B,G,R bytes.
    val w = 2; val h = 2
    // bottom row:  (10,20,30) (40,50,60)   → image row y=1
    // top row:     (70,80,90) (100,110,120) → image row y=0
    val tight = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val padded = Array[Byte](10, 20, 30, 40, 50, 60, 0, 0, 70, 80, 90, 100, 110, 120, 0, 0)
    for (frame <- Seq(tight, padded)) {
      val img = Multimodal.decodeVideoFrame(frame, 0, frame.length, w, h).get
      // (x=0, y=0) is the TOP-left = DIB's LAST row, first pixel (B=70,G=80,R=90)
      assert((img.getRGB(0, 0) & 0xffffff) == ((90 << 16) | (80 << 8) | 70))
      assert((img.getRGB(1, 0) & 0xffffff) == ((120 << 16) | (110 << 8) | 100))
      assert((img.getRGB(0, 1) & 0xffffff) == ((30 << 16) | (20 << 8) | 10))
      assert((img.getRGB(1, 1) & 0xffffff) == ((60 << 16) | (50 << 8) | 40))
    }
    // a span that is neither tight nor padded nor ImageIO-decodable → None
    assert(Multimodal.decodeVideoFrame(new Array[Byte](7), 0, 7, w, h).isEmpty)
  }

  test("mixed frames: decodable ones count pixels, the rest keep md5 identity") {
    val good = jpegBytes(gradient(8, 8))
    val junk = "not an image and not w*h*3 sized".getBytes("UTF-8")
    val payload = Multimodal.syntheticAvi(8, 8, 1000L, Seq(good, junk), compressed = true)
    val r = Multimodal
      .extractVideoPixelFeatures(Seq((1L, payload)).toDF("doc_id", "payload"), bins = 4)
      .collect().head
    assert(r.decoded && r.n_frame_chunks == 2L && r.n_decoded_frames == 1L)
    assert(r.undecoded_hashes.toSeq == Seq(Multimodal.portableHash60(md, junk)))
    assert(r.hist.sum == 8L * 8 * 3)
    // non-AVI payload: flagged fallback with the whole-payload hash
    val fb = Multimodal
      .extractVideoPixelFeatures(Seq((2L, junk)).toDF("doc_id", "payload"), bins = 4)
      .collect().head
    assert(!fb.decoded && fb.hist.forall(_ == 0))
    assert(fb.undecoded_hashes.toSeq == Seq(Multimodal.portableHash60(md, junk)))
  }
}
