package graft

import graft.operators.{CdcChunking, Multimodal}
import org.apache.spark.sql.functions._

class CdcChunkingSpec extends SparkTestBase {
  import spark.implicits._

  private def payload(seed: Long, n: Int): Array[Byte] = {
    val rnd = new java.util.Random(seed)
    val b = new Array[Byte](n); rnd.nextBytes(b); b
  }

  test("boundaries are deterministic, respect min/max, and cover the payload exactly") {
    val bytes = payload(1L, 50000)
    val b1 = CdcChunking.boundaries(bytes, avgBits = 10, minSize = 64, maxSize = 8192)
    val b2 = CdcChunking.boundaries(bytes, avgBits = 10, minSize = 64, maxSize = 8192)
    b1 shouldBe b2
    b1.last shouldBe bytes.length
    val sizes = (b1.head +: b1.sliding(2).collect { case Seq(a, b) => b - a }.toSeq)
    sizes.init.foreach { s => s should be >= 64; s should be <= 8192 }
    sizes.last should be <= 8192
    // expected chunk size ~2^10: the count should be in a sane band
    sizes.length.toLong should be > (50000L / 8192)
    sizes.length.toLong should be < (50000L / 64)
  }

  test("shift invariance: a prefix insertion re-aligns chunk digests after one boundary") {
    val base = payload(7L, 40000)
    val shifted = payload(99L, 137) ++ base // insert 137 bytes at the front
    val rows = Seq(
      Multimodal.MediaRow(1L, "blob", "a", base),
      Multimodal.MediaRow(2L, "blob", "b", shifted))
    val chunks = CdcChunking.chunks(spark.createDataset(rows))
      .select($"media_id", $"chunk_md5").as[(Long, String)].collect()
    val ofBase = chunks.filter(_._1 == 1L).map(_._2).toSet
    val ofShifted = chunks.filter(_._1 == 2L).map(_._2).toSet
    // all but the first couple of chunks of the shifted copy re-align —
    // the defining CDC property a fixed-size chunker cannot have
    val shared = ofBase.intersect(ofShifted).size.toDouble / ofBase.size
    shared should be > 0.8
  }

  test("dedup stats: identical payloads collapse to one physical copy") {
    val blob = payload(3L, 20000)
    val rows = Seq(
      Multimodal.MediaRow(1L, "blob", "a", blob),
      Multimodal.MediaRow(2L, "blob", "b", blob),
      Multimodal.MediaRow(3L, "blob", "c", payload(4L, 10000)),
      Multimodal.MediaRow(4L, "blob", "d", null))
    val stats = CdcChunking.dedupStats(
      CdcChunking.chunks(spark.createDataset(rows))).head()
    stats.getLong(1) shouldBe 50000L // logical
    stats.getLong(2) shouldBe 30000L // physical: twin stored once
    stats.getDouble(3) shouldBe 0.6 +- 1e-9
  }
}
