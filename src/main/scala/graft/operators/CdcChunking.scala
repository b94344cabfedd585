package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — storage-level dedup for BINARY payloads
  * (the multimodal columns' counterpart of text near-dup): split each
  * payload at content-determined boundaries via a gear rolling hash, so a
  * byte subsequence shared between payloads chunks identically regardless
  * of where it sits — insertions re-align after one boundary instead of
  * shifting every fixed-size block (the LBFS/FastCDC construction; public
  * technique used by borg/restic/data-lake dedup).
  *
  * Scale shape: chunking is a narrow `mapPartitions` over payload bytes (no
  * shuffle); what crosses the wire afterwards is (media_id, offset, length,
  * 16-byte digest) per chunk — never payload bytes — and chunk-level dedup
  * is one hash aggregate on the digest.
  */
object CdcChunking {

  /** One chunk of one payload. */
  final case class Chunk(media_id: Long, chunk_idx: Int, offset: Long,
      length: Long, chunk_md5: String)

  /** Deterministic gear table (seeded SplitMix-style) — fixed across runs
    * and JVMs so chunk boundaries are reproducible engine state, not
    * session state.
    */
  private val gear: Array[Long] = {
    var x = 0x9e3779b97f4a7c15L
    Array.fill(256) {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }

  /** Boundary offsets of `bytes` under the gear hash: cut when the top
    * `avgBits` bits of the rolling hash are zero (expected chunk ≈
    * 2^avgBits bytes), never before `minSize`, always by `maxSize`.
    */
  private[graft] def boundaries(bytes: Array[Byte], avgBits: Int,
      minSize: Int, maxSize: Int): Seq[Int] = {
    val mask = ((1L << avgBits) - 1) << (64 - avgBits)
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var start = 0
    while (start < bytes.length) {
      var h = 0L
      var i = start
      var cut = -1
      val hardEnd = math.min(bytes.length, start + maxSize)
      while (cut < 0 && i < hardEnd) {
        h = (h << 1) + gear(bytes(i) & 0xff)
        if (i - start + 1 >= minSize && (h & mask) == 0L) cut = i + 1
        i += 1
      }
      val end = if (cut > 0) cut else hardEnd
      out += end
      start = end
    }
    out.toSeq
  }

  /** Chunk every payload: (`media_id`, `chunk_idx`, `offset`, `length`,
    * `chunk_md5`). Null/empty payloads yield no chunks.
    */
  def chunks(media: Dataset[Multimodal.MediaRow], avgBits: Int = 10,
      minSize: Int = 64, maxSize: Int = 8192): DataFrame = {
    require(avgBits > 0 && avgBits < 32, s"avgBits in (0,32), got $avgBits")
    require(minSize > 0 && maxSize >= minSize,
      s"need 0 < minSize <= maxSize, got $minSize/$maxSize")
    implicit val enc = Encoders.product[Chunk]
    media.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
        if (bytes.isEmpty) Iterator.empty
        else {
          var prev = 0
          boundaries(bytes, avgBits, minSize, maxSize).iterator.zipWithIndex.map {
            case (end, idx) =>
              digest.reset()
              digest.update(bytes, prev, end - prev)
              val md5 = digest.digest().map("%02x".format(_)).mkString
              val c = Chunk(r.media_id, idx, prev.toLong, (end - prev).toLong, md5)
              prev = end
              c
          }
        }
      }
    }.toDF()
  }

  /** Corpus-level chunk-dedup accounting: one row with logical bytes,
    * distinct-chunk (physical) bytes, and the dedup ratio — the "what
    * would a content-addressed store save" answer, from digests alone.
    */
  def dedupStats(chunkDf: DataFrame): DataFrame = {
    val distinctBytes = chunkDf.groupBy(col("chunk_md5"))
      .agg(first(col("length")).alias("len"))
      .agg(coalesce(sum(col("len")), lit(0L)).alias("physical_bytes"))
    chunkDf.agg(
        count(lit(1)).alias("n_chunks"),
        coalesce(sum(col("length")), lit(0L)).alias("logical_bytes"))
      .crossJoin(broadcast(distinctBytes))
      .select(col("n_chunks"), col("logical_bytes"), col("physical_bytes"),
        when(col("logical_bytes") > 0,
          col("physical_bytes").cast("double") / col("logical_bytes"))
          .otherwise(lit(1.0)).alias("dedup_ratio"))
  }
}
