package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingestion — the interchange format of
  * Common Crawl and every web-scale pretraining corpus. Beyond-parity
  * source (the reference ingests REST JSON only); the Spark shape is the
  * industry-standard one: WARC files are NOT block-splittable (records are
  * length-prefixed and, in `.warc.gz`, per-record gzip members), so the
  * parallelism unit is the FILE — `binaryFile` reads each ~1 GB archive
  * whole, and a partition-batched flatMap walks its records. At 100 TB
  * (≈100k files) that is one task per archive, embarrassingly parallel,
  * with no shuffle until the caller aggregates.
  *
  * Parser discipline (header layout per the public ISO 28500 / IIPC spec):
  *  - binary-safe: payload bytes are jumped via `Content-Length`, never
  *    scanned — a payload containing `WARC/1.1` or bare CRCRLF cannot
  *    desync the walk;
  *  - multi-member gzip streams (the `.warc.gz` convention: one member per
  *    record) inflate transparently (`GZIPInputStream` consumes
  *    concatenated members);
  *  - malformed tails fail SOFT but VISIBLY: the per-file walk stops at the
  *    first unparseable offset and emits a `__truncated` marker record
  *    (warc_type `__parse_error`) so corrupt archives surface in one
  *    `filter` instead of silently shortening the corpus.
  */
object WarcSource {

  /** One parsed record; `payload` is the raw block (HTTP headers included
    * for `response` records — stripping them is [[httpBody]]'s job).
    */
  final case class WarcRecord(
      file: String,
      seq: Int,              // record ordinal within its file
      warc_type: String,
      target_uri: String,
      warc_date: String,
      record_id: String,
      content_length: Long,
      payload: Array[Byte]
  )

  /** Read a WARC path/glob into a DataFrame of [[WarcRecord]] rows. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    implicit val enc = Encoders.product[WarcRecord]
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, bytes) => parse(p, bytes) })
      .toDF()
  }

  /** HTTP response body of a `response` record payload: bytes after the
    * first CRLFCRLF (the HTTP header/body split); non-HTTP payloads pass
    * through unchanged.
    */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    val at = indexOfCrlfCrlf(payload, 0, payload.length)
    if (at < 0) payload
    else java.util.Arrays.copyOfRange(payload, at + 4, payload.length)
  }

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int, end: Int): Int = {
    var i = from
    while (i + 3 < end) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  private[graft] def parse(file: String, raw: Array[Byte]): Iterator[WarcRecord] = {
    val bytes =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
        gunzipAll(raw)
      else raw
    var off = 0
    var seq = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var broken = false
    while (!broken && off < bytes.length) {
      // skip inter-record CRLFs
      while (off < bytes.length && (bytes(off) == '\r' || bytes(off) == '\n')) off += 1
      if (off >= bytes.length) ()
      else {
        val headerEnd = indexOfCrlfCrlf(bytes, off, bytes.length)
        val version = headerEnd >= 0 && {
          val line = new String(bytes, off, math.min(10, headerEnd - off),
            java.nio.charset.StandardCharsets.US_ASCII)
          line.startsWith("WARC/")
        }
        if (!version) {
          out += WarcRecord(file, seq, "__parse_error", "", "", "", -1L,
            Array.emptyByteArray)
          broken = true
        } else {
          val header = new String(bytes, off, headerEnd - off,
            java.nio.charset.StandardCharsets.UTF_8)
          val fields = header.linesIterator.drop(1).flatMap { l =>
            val i = l.indexOf(':')
            if (i < 0) None else Some(l.take(i).trim.toLowerCase -> l.drop(i + 1).trim)
          }.toMap
          val len = fields.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
          val start = headerEnd + 4
          if (len < 0 || start + len > bytes.length) {
            out += WarcRecord(file, seq, "__parse_error", "", "", "", len,
              Array.emptyByteArray)
            broken = true
          } else {
            out += WarcRecord(file, seq,
              fields.getOrElse("warc-type", ""),
              fields.getOrElse("warc-target-uri", ""),
              fields.getOrElse("warc-date", ""),
              fields.getOrElse("warc-record-id", ""),
              len,
              java.util.Arrays.copyOfRange(bytes, start, (start + len).toInt))
            off = (start + len).toInt
            seq += 1
          }
        }
      }
      if (off >= bytes.length) broken = true
    }
    out.iterator
  }

  /** Inflate a (possibly multi-member) gzip stream fully. */
  private def gunzipAll(raw: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(raw))
    try in.readAllBytes() finally in.close()
  }

  /** Deterministic synthetic WARC bytes — test/oracle fixture: `n`
    * response records with reproducible URIs and HTML payloads (HTTP
    * headers included, exactly the layout [[httpBody]] strips), plus a
    * leading `warcinfo` record like real crawls carry.
    */
  private[graft] def syntheticWarc(n: Int, gzip: Boolean = false): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val sb = new java.io.ByteArrayOutputStream()
    def record(typ: String, uri: String, id: Int, payload: Array[Byte]): Unit = {
      val hdr = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append(s"WARC-Type: $typ\r\n")
        .append(if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "")
        .append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
        .append(f"WARC-Record-ID: <urn:uuid:rec-$id%05d>\r\n")
        .append(s"Content-Length: ${payload.length}\r\n\r\n")
      sb.write(hdr.toString.getBytes(ascii))
      sb.write(payload)
      sb.write("\r\n\r\n".getBytes(ascii))
    }
    record("warcinfo", "", 0, "software: graft-synthetic\r\n".getBytes(ascii))
    (1 to n).foreach { i =>
      val body = s"<html><body>doc $i ${"x" * (i * 3)}</body></html>"
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$body"
      record("response", s"https://example.com/page$i", i, http.getBytes(ascii))
    }
    val plain = sb.toByteArray
    if (!gzip) plain
    else {
      val out = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(plain); gz.close()
      out.toByteArray
    }
  }
}
