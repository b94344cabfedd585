package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{DecodedMedia, MediaRow}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def media(kind: String, n: Int): Seq[MediaRow] =
    (0 until n).map(i =>
      MediaRow(i.toLong, kind, s"s3://bucket/$kind/$i.bin",
        s"payload-$kind-$i".getBytes("UTF-8")))

  test("decode is a typed, deterministic partition transform") {
    val ds = spark.createDataset(media("image", 8))
    val out1 = Multimodal.decode(ds).collect().sortBy(_.media_id)
    val out2 = Multimodal.decode(ds).collect().sortBy(_.media_id)
    out1 shouldBe out2
    out1.foreach { d =>
      d.byte_len should be > 0L
      d.sha256.length shouldBe 64
      d.width should be > 0
      d.channels shouldBe 3
      d.duration_ms shouldBe 0L
    }
  }

  test("sha256 matches the JVM digest (binary hygiene through the engine)") {
    val payload = "payload-image-0".getBytes("UTF-8")
    val want = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload).map("%02x".format(_)).mkString
    val got = Multimodal.decode(spark.createDataset(media("image", 1)))
      .collect().head.sha256
    got shouldBe want
  }

  test("audio/video stubs fill the right metadata fields") {
    val audio = Multimodal.decode(spark.createDataset(media("audio", 2))).collect()
    audio.foreach { d => d.width shouldBe 0; d.duration_ms should be > 0L }
    val video = Multimodal.decode(spark.createDataset(media("video", 2))).collect()
    video.foreach { d => d.width should be > 0; d.duration_ms should be > 0L }
  }

  test("MP4 box parse reads real duration and track dimensions") {
    // Minimal ISO-BMFF stream assembled per ISO/IEC 14496-12: ftyp, then
    // moov{mvhd(timescale 1000, duration 5000), trak{tkhd(640x360 16.16)}}.
    def be32(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(v).array()
    def box(typ: String, content: Array[Byte]): Array[Byte] =
      be32(8 + content.length) ++ typ.getBytes("ISO-8859-1") ++ content
    val mvhd = box("mvhd",
      be32(0) ++                       // version 0 + flags
        be32(0) ++ be32(0) ++          // creation, modification
        be32(1000) ++ be32(5000) ++    // timescale, duration → 5000 ms
        Array.fill[Byte](80)(0))       // rate..next_track_id padding
    val tkhd = box("tkhd",
      be32(0) ++                                  // version 0 + flags
        be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(5000) ++
        Array.fill[Byte](8 + 2 + 2 + 2 + 2 + 36)(0) ++
        be32(640 << 16) ++ be32(360 << 16))       // width, height (16.16)
    val mp4 = box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0)) ++
      box("moov", mvhd ++ box("trak", tkhd))

    Multimodal.mp4Decode(mp4) shouldBe Some((640, 360, 5000L))

    // end to end through the typed decode path
    val ds = spark.createDataset(Seq(MediaRow(7L, "video", "v.mp4", mp4)))
    val d = Multimodal.decode(ds).collect().head
    d.duration_ms shouldBe 5000L
    d.width shouldBe 640
    d.height shouldBe 360

    // 64-bit version-1 mvhd parses too
    val mvhd1 = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++
        Array.fill[Byte](16)(0) ++     // 64-bit creation + modification
        be32(600) ++                   // timescale
        java.nio.ByteBuffer.allocate(8).putLong(1200L).array() ++ // duration
        Array.fill[Byte](80)(0))
    val mp4v1 = box("moov", mvhd1)
    Multimodal.mp4Decode(mp4v1).map(_._3) shouldBe Some(2000L) // 1200/600 s

    // non-BMFF bytes fall back to None (stub path)
    Multimodal.mp4Decode("not a video".getBytes) shouldBe None
  }

  test("decode survives null payloads") {
    val ds = spark.createDataset(Seq(MediaRow(1L, "image", "u", null)))
    val d = Multimodal.decode(ds).collect().head
    d.byte_len shouldBe 0L
    d.width shouldBe 0
  }

  test("frame sampling emits framesPerItem descriptors per video only") {
    val df = spark.createDataset(media("video", 3) ++ media("image", 2)).toDF()
    val frames = Multimodal.sampleFrames(df, framesPerItem = 4)
    frames.count() shouldBe 12
    frames.select("frame_offset_ms").as[Long].collect().max shouldBe 3000L
  }

  test("real PNG payloads decode to their true dimensions via the JDK codec") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8800)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, "image", "s3://b/a.png", png(320, 200)),
      MediaRow(2L, "image", "s3://b/b.png", png(64, 64)),
      MediaRow(3L, "image", "s3://b/junk.bin", "not-an-image".getBytes("UTF-8")))
    val out = Multimodal.decode(spark.createDataset(rows))
      .collect().map(d => d.media_id -> d).toMap
    out(1L).width shouldBe 320
    out(1L).height shouldBe 200
    out(1L).channels shouldBe 3
    out(2L).width shouldBe 64
    // unrecognized bytes fall back to the deterministic stub, not a crash
    out(3L).width should be > 0
  }

  test("real WAV payloads decode to true channel count and duration") {
    def wav(channels: Int, seconds: Double, sampleRate: Float = 8000f): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels, true, false)
      val nFrames = (sampleRate * seconds).toLong
      val data = new Array[Byte](nFrames.toInt * fmt.getFrameSize)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nFrames)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, "audio", "s3://b/mono.wav", wav(1, 2.0)),
      MediaRow(2L, "audio", "s3://b/stereo.wav", wav(2, 0.5)),
      MediaRow(3L, "audio", "s3://b/junk.bin", "not-audio".getBytes("UTF-8")))
    val out = Multimodal.decode(spark.createDataset(rows))
      .collect().map(d => d.media_id -> d).toMap
    out(1L).channels shouldBe 1
    out(1L).duration_ms shouldBe 2000L
    out(2L).channels shouldBe 2
    out(2L).duration_ms shouldBe 500L
    out(3L).duration_ms should be > 0L  // stub fallback, not a crash
  }

  test("resize fits into the target box, preserves aspect, never upscales") {
    val decoded = Multimodal.decode(spark.createDataset(media("image", 12)))
    val resized = Multimodal.resize(decoded, 256, 256).collect()
    val orig    = decoded.collect().map(d => d.media_id -> d).toMap
    resized.foreach { r =>
      val o = orig(r.media_id)
      r.width should be <= o.width   // never upscales
      r.height should be <= o.height
      if (o.width > 256 || o.height > 256) {
        (r.width <= 256 && r.height <= 256) shouldBe true
        val arOrig = o.width.toDouble / o.height
        val arNew  = r.width.toDouble / r.height
        math.abs(arOrig - arNew) / arOrig should be < 0.05
      } else {
        r.width shouldBe o.width
        r.height shouldBe o.height
      }
    }
  }

  test("binary metadata pass works untyped from a DataFrame") {
    val df = spark.createDataset(media("image", 2)).toDF()
    val out = Multimodal.withBinaryMeta(df)
    out.filter($"byte_len" <= 0).count() shouldBe 0
    out.select("sha256").as[String].collect().foreach(_.length shouldBe 64)
  }

  test("dHash: perturbation-stable, seed-divergent, null on undecodable bytes") {
    val a = Multimodal.dHash64(Multimodal.syntheticPng(7L)).get
    val aTwin = Multimodal.dHash64(Multimodal.syntheticPng(7L, flipped = true)).get
    val b = Multimodal.dHash64(Multimodal.syntheticPng(8L)).get
    java.lang.Long.bitCount(a ^ aTwin) should be <= 3  // one flipped pixel
    java.lang.Long.bitCount(a ^ b) should be > 15      // unrelated noise
    Multimodal.dHash64("not an image".getBytes) shouldBe None
    // deterministic across calls (same bytes -> same hash)
    Multimodal.dHash64(Multimodal.syntheticPng(7L)).get shouldBe a
  }

  test("image near-dup pairs: banded join finds twins, skips unrelated, dedups bands") {
    val rows = Seq(
      MediaRow(1L, "image", "u1", Multimodal.syntheticPng(1L)),
      MediaRow(2L, "image", "u2", Multimodal.syntheticPng(1L, flipped = true)),
      MediaRow(3L, "image", "u3", Multimodal.syntheticPng(99L)),
      MediaRow(4L, "image", "u4", Multimodal.syntheticPng(1L)),      // exact dup of 1
      MediaRow(5L, "image", "u5", "garbage".getBytes)                // undecodable
    )
    val pairs = Multimodal.nearDupImagePairs(spark.createDataset(rows), maxHamming = 7)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    pairs.keySet shouldBe Set((1L, 2L), (1L, 4L), (2L, 4L))
    pairs((1L, 4L)) shouldBe 0L   // exact dup: identical hash, one row despite 8 bands
    an[IllegalArgumentException] should be thrownBy
      Multimodal.nearDupImagePairs(spark.createDataset(rows), maxHamming = 8)
  }
}
