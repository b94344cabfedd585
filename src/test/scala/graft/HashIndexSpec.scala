package graft

import graft.operators.{HashIndex, Multimodal}
import graft.operators.Multimodal.MediaRow
import org.apache.spark.sql.functions._

class HashIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("persist/read round trip dedups ids, drops null hashes, derives bands from published rows") {
    val root = java.nio.file.Files.createTempDirectory("hashidx").toString
    val rows = Seq((1L, Option(10L)), (1L, Option(10L)), (2L, Option.empty[Long]),
      (3L, Option(0x0102030405060708L))).toDF("id", "dhash")
    HashIndex.persist(rows, root)
    val idx = HashIndex.read(spark, root)
    idx.hashes.select("id").as[Long].collect().sorted.toSeq shouldBe Seq(1L, 3L)
    idx.bands.count() shouldBe 16 // 8 bands per surviving hash
    // band values are the hash's bytes
    idx.bands.filter($"id" === 3L).orderBy("__band")
      .select("__v").as[Long].collect().toSeq shouldBe
      Seq(8L, 7L, 6L, 5L, 4L, 3L, 2L, 1L)
  }

  test("probe finds perturbation twins; append skips already-indexed ids; redelivery self-matches") {
    val root = java.nio.file.Files.createTempDirectory("hashidx2").toString
    def hashes(rows: Seq[MediaRow]) =
      Multimodal.imageHashes(spark.createDataset(rows))
        .withColumnRenamed("media_id", "id")
    val d1 = (0L until 10L).map(i => MediaRow(i, "image", s"i/$i", Multimodal.syntheticPng(i)))
    HashIndex.persist(hashes(d1), root)

    val d2 = (0L until 5L).map(i =>
        MediaRow(100L + i, "image", s"t/$i", Multimodal.syntheticPng(i, flipped = true))) ++
      (0L until 5L).map(i =>
        MediaRow(110L + i, "image", s"f/$i", Multimodal.syntheticPng(500L + i)))
    val h2 = hashes(d2)
    val hits = HashIndex.probe(HashIndex.read(spark, root), h2).collect()
    hits.map(_.getLong(0)).distinct.sorted.toSeq shouldBe (100L until 105L)
    hits.foreach { r => r.getLong(1) shouldBe r.getLong(0) - 100L } // twin → its source

    // caller keeps survivors (probe decides, append stores). Each delivery
    // run derives its plan FRESH from the current index — a DataFrame built
    // against a pre-swap listing pins the old files and cannot be re-executed
    // after the index republishes (Spark plans capture the file listing).
    def survivors() = h2.join(
      HashIndex.probe(HashIndex.read(spark, root), h2).select("id").distinct(),
      Seq("id"), "left_anti")
    HashIndex.append(spark, root, survivors())
    HashIndex.read(spark, root).hashes.count() shouldBe 15
    HashIndex.append(spark, root, survivors()) // idempotent redelivery
    HashIndex.read(spark, root).hashes.count() shouldBe 15
    // a redelivered fresh item now matches its own indexed row exactly
    HashIndex.probe(HashIndex.read(spark, root), h2)
      .filter($"id" >= 110L && $"id" === $"matched_id" && $"hamming" === 0L)
      .count() shouldBe 5
  }

  test("audio and video-frame fingerprints ride the same index") {
    val root = java.nio.file.Files.createTempDirectory("hashidx3").toString
    // audio: index 3 clips, probe a gain-halved twin of clip 0
    def wav(seed: Long) = Multimodal.syntheticWav(seed, 16000, 1, 6000)
    val clips = (0L until 3L).map(i => MediaRow(i, "audio", s"a/$i", wav(i)))
    HashIndex.persist(
      Multimodal.audioHashes(spark.createDataset(clips)).withColumnRenamed("media_id", "id"),
      root)
    val twin = Multimodal.audioHashes(spark.createDataset(
        Seq(MediaRow(42L, "audio", "a/twin", Multimodal.halveWavAmplitude(wav(0L))))))
      .withColumnRenamed("media_id", "id")
    val hit = HashIndex.probe(HashIndex.read(spark, root), twin).collect()
    hit.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq((42L, 0L))

    // video frames: index video A's frames keyed media_id*100+frame_idx;
    // a clip sharing frame seeds collides on exactly the shared frames
    val root2 = java.nio.file.Files.createTempDirectory("hashidx4").toString
    def noiseAvi(seeds: Seq[Long]) =
      Multimodal.syntheticAviFrom(64, 64, 40000L, seeds.map(Multimodal.syntheticJpegNoise))
    def frameHashes(rows: Seq[MediaRow]) =
      Multimodal.videoFrames(spark.createDataset(rows))
        .select(($"media_id" * 100 + $"frame_idx").alias("id"), $"dhash")
    HashIndex.persist(frameHashes(Seq(
      MediaRow(1L, "video", "v/a", noiseAvi(Seq(10L, 11L, 12L, 13L))))), root2)
    val probeB = frameHashes(Seq(
      MediaRow(2L, "video", "v/b", noiseAvi(Seq(12L, 13L, 99L, 98L)))))
    val matches = HashIndex.probe(HashIndex.read(spark, root2), probeB).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    matches shouldBe Seq((200L, 102L), (201L, 103L)) // B frames 0,1 = A frames 2,3
  }
}
