package graft.ext

import graft.SparkSpec
import java.awt.image.BufferedImage

/** The featurizer's REAL decode lane: synthetic PNGs are decoded with
  * `javax.imageio` inside the mapPartitions batch shape and must yield
  * pixel-derived features (not hash-derived fakes); undecodable payloads
  * fall back to the oracle-checked md5 stub, flagged as such.
  */
class ImageCodecSpec extends SparkSpec {
  import spark.implicits._

  private def png(width: Int, height: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until height; x <- 0 until width) img.setRGB(x, y, pixel(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("solid-color PNG decodes to exact dimensions and histogram") {
    // pure red: R channel all in the top bin, G and B all in the bottom
    val red = png(6, 4)((_, _) => 0xff0000)
    val df = Seq((1L, red)).toDF("doc_id", "payload")
    val r = Multimodal.extractImageFeatures(df, bins = 4).collect().head
    assert(r.decoded && r.width == 6 && r.height == 4)
    val f = r.features
    assert(f.length == 12)
    assert(f(3) == 1.0f, "all red pixels in the top R bin")
    assert(f(4) == 1.0f && f(8) == 1.0f, "G and B all zero -> bottom bins")
    assert(math.abs(f.sum - 3.0f) < 1e-6, "each channel's histogram sums to 1")
  }

  test("gradient PNG: histogram matches a direct pixel count") {
    // horizontal gray gradient 0..255 over 256x2 — each 64-wide stripe
    // lands in one bin of 4, identically for R, G and B
    val grad = png(256, 2)((x, _) => (x << 16) | (x << 8) | x)
    val df = Seq((2L, grad)).toDF("doc_id", "payload")
    val r = Multimodal.extractImageFeatures(df, bins = 4).collect().head
    assert(r.decoded && r.width == 256 && r.height == 2)
    r.features.foreach(v => assert(v == 0.25f, s"uniform gradient -> 0.25 per bin, got $v"))
  }

  test("undecodable payload falls back to the md5 stub, flagged") {
    val junk = "definitely not an image".getBytes("UTF-8")
    val df = Seq((3L, junk)).toDF("doc_id", "payload")
    val r = Multimodal.extractImageFeatures(df, bins = 4).collect().head
    assert(!r.decoded && r.width == -1 && r.height == -1)
    // exact stub contract: feature j = portableHash60(payload ++ "#j") ppm
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = Multimodal.decodeStub(md, junk, Multimodal.dimTags(12))
    assert(r.features.sameElements(expected))
  }

  test("nearest-neighbor resize picks exact source pixels, deterministically") {
    // left half red, right half blue; downscale 8x4 -> 4x2 keeps the
    // halves exactly (sx = x*8/4 lands on source columns 0,2,4,6)
    val img = new BufferedImage(8, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8) img.setRGB(x, y, if (x < 4) 0xff0000 else 0x0000ff)
    val small = Multimodal.resizeImage(img, 4, 2)
    assert(small.getWidth == 4 && small.getHeight == 2)
    for (y <- 0 until 2; x <- 0 until 4)
      assert((small.getRGB(x, y) & 0xffffff) == (if (x < 2) 0xff0000 else 0x0000ff))
    // and through the featurizer: histogram computed on the RESIZED raster
    val out = java.io.File.createTempFile("graft", ".png")
    javax.imageio.ImageIO.write(img, "png", out)
    val payload = java.nio.file.Files.readAllBytes(out.toPath)
    val r = Multimodal
      .extractImageFeatures(
        Seq((9L, payload)).toDF("doc_id", "payload"), bins = 2, resizeTo = Some((4, 2)))
      .collect().head
    assert(r.width == 8 && r.height == 4, "reported dims stay the original's")
    assert(r.features(1) == 0.5f && r.features(5) == 0.5f, "half top-bin red, half top-bin blue")
  }

  test("mixed batch keeps lanes independent and partition-parallel") {
    val rows = (0L until 40L).map { i =>
      if (i % 3 == 0) (i, "junk %d".format(i).getBytes("UTF-8"))
      else (i, png(4, 4)((_, _) => 0x00ff00))
    }
    val out = Multimodal
      .extractImageFeatures(rows.toDF("doc_id", "payload").repartition(4), bins = 2, batchSize = 8)
      .collect()
      .map(r => r.doc_id -> r)
      .toMap
    assert(out.size == 40)
    (0L until 40L).foreach { i =>
      if (i % 3 == 0) assert(!out(i).decoded)
      else assert(out(i).decoded && out(i).width == 4 && out(i).features(3) == 1.0f)
    }
  }
}
