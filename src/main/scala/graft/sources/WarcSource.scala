package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** WARC (Web ARChive, ISO 28500) ingestion — the interchange format of
  * Common Crawl and every web-scale pretraining corpus. Beyond-parity
  * source (the reference ingests REST JSON only); the Spark shape is the
  * industry-standard one: WARC files are NOT block-splittable (records are
  * length-prefixed and, in `.warc.gz`, per-record gzip members), so the
  * parallelism unit is the FILE — but within a task the archive is
  * STREAMED record by record over an `FSDataInputStream` (gzip members
  * inflate incrementally through `GZIPInputStream`), so peak memory per
  * task is ONE record, not one archive. That removes both `binaryFile`
  * ceilings: the 2 GB JVM-array file limit and the inflate-to-one-array
  * spike (a ~1 GB Common Crawl gz segment inflates to 3-5 GB — over the
  * array limit — if materialized). At 100 TB (≈100k files) this is one
  * task per archive, embarrassingly parallel, no shuffle until the caller
  * aggregates.
  *
  * Parser discipline (header layout per the public ISO 28500 / IIPC spec):
  *  - binary-safe: payload bytes are jumped via `Content-Length`, never
  *    scanned — a payload containing `WARC/1.1` or bare CRCRLF cannot
  *    desync the walk;
  *  - multi-member gzip streams (the `.warc.gz` convention: one member per
  *    record) inflate transparently (`GZIPInputStream` consumes
  *    concatenated members);
  *  - bounded: headers are capped at 64 KB; payloads above `maxRecordBytes`
  *    are SKIPPED in the stream (never allocated) and surface as one
  *    `__oversize` marker row carrying the declared length;
  *  - malformed tails fail SOFT but VISIBLY: the per-file walk stops at the
  *    first unparseable offset and emits a marker record (warc_type
  *    `__parse_error`) so corrupt archives surface in one `filter` instead
  *    of silently shortening the corpus.
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

  private val MaxHeaderBytes = 64 * 1024

  /** Read a WARC path/glob into a DataFrame of [[WarcRecord]] rows.
    *
    * `path` may be a file, a directory (its immediate files are read), or a
    * Hadoop glob. Each file becomes exactly one partition (WARC is not
    * block-splittable), and each task holds at most `maxRecordBytes` of
    * payload at a time.
    */
  def read(spark: SparkSession, path: String,
      maxRecordBytes: Long = 1L << 30): DataFrame = {
    implicit val enc = Encoders.product[WarcRecord]
    val files = listFiles(spark, path)
    // executors rebuild the FS from the driver's Hadoop conf (object-store
    // credentials, endpoints); SerializableConfiguration is the standard
    // Spark carrier for it
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val cap = maxRecordBytes
    // one file per partition, no shuffle: parallelize slices the path list
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { p =>
        val hPath = new org.apache.hadoop.fs.Path(p)
        val fs = hPath.getFileSystem(confBc.value.value)
        val raw = fs.open(hPath)
        val in = maybeGunzip(new java.io.BufferedInputStream(raw, 1 << 16))
        // parseStream is fully lazy; records materialize one at a time as
        // the iterator drains, and the stream closes at exhaustion
        parseStream(p, in, cap)
      }
    spark.createDataset(rdd).toDF()
  }

  /** Immediate files under a path/dir/glob, sorted for determinism. */
  private def listFiles(spark: SparkSession, path: String): Seq[String] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(hPath)).map(_.toSeq).getOrElse(Seq.empty)
    matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
      else Seq(st)
    }.map(_.getPath.toString).sorted
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

  /** In-memory parse — kept for tests/tools; delegates to the streaming
    * walk so there is exactly ONE parser.
    */
  private[graft] def parse(file: String, raw: Array[Byte]): Iterator[WarcRecord] =
    parseStream(file, maybeGunzip(new java.io.ByteArrayInputStream(raw)))

  /** Wrap `in` in a streaming inflater iff it starts with the gzip magic
    * (detected by lookahead, not extension — crawlers misname files).
    */
  private def maybeGunzip(in: java.io.InputStream): java.io.InputStream = {
    val pb = new java.io.PushbackInputStream(in, 2)
    val b0 = pb.read(); val b1 = pb.read()
    if (b1 >= 0) pb.unread(b1)
    if (b0 >= 0) pb.unread(b0)
    if (b0 == 0x1f && b1 == 0x8b)
      new java.util.zip.GZIPInputStream(pb, 1 << 16)
    else pb
  }

  /** Streaming record walk: pulls one record at a time off `in`; closes the
    * stream when exhausted (or broken). Peak memory = one header + one
    * payload ≤ `maxRecordBytes`.
    */
  private[graft] def parseStream(file: String, in0: java.io.InputStream,
      maxRecordBytes: Long = 1L << 30): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private val in = new java.io.PushbackInputStream(in0, 1)
      private var nextRec: WarcRecord = _
      private var broken = false
      private var recSeq = 0
      private def close(): Unit = { broken = true; try in.close() catch { case _: Exception => () } }
      private def err(len: Long): WarcRecord = {
        close()
        WarcRecord(file, recSeq, "__parse_error", "", "", "", len, Array.emptyByteArray)
      }
      private def advance(): Unit = {
        nextRec = null
        if (broken) return
        try {
          // skip inter-record CRLFs
          var c = in.read()
          while (c == '\r' || c == '\n') c = in.read()
          if (c < 0) { close(); return } // clean EOF
          in.unread(c)
          // header: bytes up to CRLFCRLF, bounded
          val hdr = new java.io.ByteArrayOutputStream(512)
          var tail = 0 // rolling match state over \r\n\r\n
          var done = false
          while (!done && hdr.size < MaxHeaderBytes) {
            val b = in.read()
            if (b < 0) { nextRec = err(-1L); return } // EOF inside header
            hdr.write(b)
            tail = (b: @annotation.switch) match {
              case '\r' => if (tail == 2) 3 else 1
              case '\n' => if (tail == 1) 2 else if (tail == 3) 4 else 0
              case _    => 0
            }
            done = tail == 4
          }
          if (!done) { nextRec = err(-1L); return } // unbounded header
          val headerBytes = hdr.toByteArray
          val headerLen = headerBytes.length - 4 // minus the CRLFCRLF
          val versionOk = {
            val n = math.min(10, headerLen)
            new String(headerBytes, 0, n, java.nio.charset.StandardCharsets.US_ASCII)
              .startsWith("WARC/")
          }
          if (!versionOk) { nextRec = err(-1L); return }
          val header = new String(headerBytes, 0, headerLen,
            java.nio.charset.StandardCharsets.UTF_8)
          val fields = header.linesIterator.drop(1).flatMap { l =>
            val i = l.indexOf(':')
            if (i < 0) None else Some(l.take(i).trim.toLowerCase -> l.drop(i + 1).trim)
          }.toMap
          val len = fields.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
          if (len < 0) { nextRec = err(len); return }
          if (len > maxRecordBytes) {
            // skip the payload IN THE STREAM — never allocated — and surface
            // the record as a marker row; the walk continues past it
            var left = len
            while (left > 0) {
              val sk = in.skip(left)
              if (sk > 0) left -= sk
              else if (in.read() < 0) { nextRec = err(len); return } // EOF mid-skip
              else left -= 1
            }
            nextRec = WarcRecord(file, recSeq, "__oversize",
              fields.getOrElse("warc-target-uri", ""),
              fields.getOrElse("warc-date", ""),
              fields.getOrElse("warc-record-id", ""),
              len, Array.emptyByteArray)
            recSeq += 1
            return
          }
          val payload = in.readNBytes(len.toInt)
          if (payload.length < len) { nextRec = err(len); return } // EOF inside payload
          nextRec = WarcRecord(file, recSeq,
            fields.getOrElse("warc-type", ""),
            fields.getOrElse("warc-target-uri", ""),
            fields.getOrElse("warc-date", ""),
            fields.getOrElse("warc-record-id", ""),
            len, payload)
          recSeq += 1
        } catch {
          case _: java.io.IOException => nextRec = err(-1L) // e.g. corrupt gzip
        }
      }
      advance() // prime
      def hasNext: Boolean = nextRec != null
      def next(): WarcRecord = {
        val r = nextRec
        advance()
        r
      }
    }

  /** Deterministic synthetic WARC bytes — test/oracle fixture: `n`
    * response records with reproducible URIs and HTML payloads (HTTP
    * headers included, exactly the layout [[httpBody]] strips), plus a
    * leading `warcinfo` record like real crawls carry.
    */
  private[graft] def syntheticWarc(n: Int, gzip: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeSyntheticWarc(out, n, gzip)
    out.toByteArray
  }

  /** Stream a synthetic archive of `n` response records to `os` — the
    * large-fixture twin of [[syntheticWarc]]: `payloadBytes` of
    * incompressible pseudo-random body per record are generated and written
    * incrementally, so multi-hundred-MB archives never exist in test-heap
    * memory either.
    */
  private[graft] def writeSyntheticWarc(os: java.io.OutputStream, n: Int,
      gzip: Boolean = false, payloadBytes: Int = 0): Unit = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val sb = if (gzip) new java.util.zip.GZIPOutputStream(os, 1 << 16) else os
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
      val body: Array[Byte] =
        if (payloadBytes <= 0)
          s"<html><body>doc $i ${"x" * (i * 3)}</body></html>".getBytes(ascii)
        else {
          // xorshift filler: incompressible, reproducible per record id
          val arr = new Array[Byte](payloadBytes)
          var x = i * 2654435761L + 1
          var j = 0
          while (j < payloadBytes) {
            x ^= x << 13; x ^= x >>> 7; x ^= x << 17
            arr(j) = x.toByte
            j += 1
          }
          arr
        }
      val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n".getBytes(ascii)
      record("response", s"https://example.com/page$i", i, http ++ body)
    }
    sb match {
      case gz: java.util.zip.GZIPOutputStream => gz.finish()
      case _ => ()
    }
    sb.flush()
  }
}
