package graft.ext

import graft.SparkSpec
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** The featurizer's REAL audio lane: synthetic WAVs decode via
  * javax.sound.sampled with exact format metadata and analytically-known
  * RMS envelopes; non-audio payloads fall back to the md5 stub.
  */
class AudioCodecSpec extends SparkSpec {
  import spark.implicits._

  /** 16-bit mono little-endian PCM WAV from a sample generator. */
  private def wav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("square-wave WAV: exact format metadata and per-window RMS") {
    // windows of constant amplitude A have RMS exactly A/32768; four
    // quarters at 0, 8192, 16384, 32767 give a known envelope
    val amps = Array[Short](0, 8192, 16384, 32767)
    val samples = amps.flatMap(a => Array.fill(4000)(a))
    val df = Seq((1L, wav(16000, samples))).toDF("doc_id", "payload")
    val r = Multimodal.extractAudioFeatures(df, windows = 4).collect().head
    assert(r.decoded && r.sample_rate == 16000 && r.channels == 1 && r.n_frames == 16000L)
    val expected = amps.map(a => (a.toDouble / 32768.0).toFloat)
    r.rms.zip(expected).foreach { case (got, exp) =>
      assert(math.abs(got - exp) < 1e-6f, s"rms $got != $exp")
    }
  }

  test("non-audio payload falls back to the md5 stub, flagged") {
    val junk = "not audio".getBytes("UTF-8")
    val r = Multimodal
      .extractAudioFeatures(Seq((2L, junk)).toDF("doc_id", "payload"), windows = 4)
      .collect().head
    assert(!r.decoded && r.sample_rate == -1 && r.n_frames == -1L)
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(r.rms.sameElements(Multimodal.decodeStub(md, junk, Multimodal.dimTags(4))))
  }

  test("mixed image/audio/junk corpus routes each row to its lane") {
    val img = {
      val b = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", out)
      out.toByteArray
    }
    val rows = Seq(
      (1L, wav(8000, Array.fill[Short](800)(1000))),
      (2L, img),
      (3L, "junk".getBytes("UTF-8")))
    val audio = Multimodal.extractAudioFeatures(rows.toDF("doc_id", "payload"))
      .collect().map(r => r.doc_id -> r.decoded).toMap
    assert(audio == Map(1L -> true, 2L -> false, 3L -> false))
    val image = Multimodal.extractImageFeatures(rows.toDF("doc_id", "payload"))
      .collect().map(r => r.doc_id -> r.decoded).toMap
    assert(image == Map(1L -> false, 2L -> true, 3L -> false))
  }
}
