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
}
