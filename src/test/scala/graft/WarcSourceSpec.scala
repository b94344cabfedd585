package graft

import graft.sources.WarcSource
import org.apache.spark.sql.functions._

class WarcSourceSpec extends SparkTestBase {
  import spark.implicits._

  test("parses multi-record WARC: types, URIs, lengths, binary-safe payload jump") {
    val recs = WarcSource.parse("f", WarcSource.syntheticWarc(5)).toSeq
    recs.map(_.warc_type) shouldBe Seq("warcinfo") ++ Seq.fill(5)("response")
    recs(1).target_uri shouldBe "https://example.com/page1"
    recs(1).record_id shouldBe "<urn:uuid:rec-00001>"
    recs.foreach(r => r.payload.length.toLong shouldBe r.content_length)
    // payload jump is Content-Length-driven: a payload CONTAINING a WARC
    // version line and bare CRLFCRLF must not desync the walk
    val evil = "WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 26\r\n\r\n" +
      "xx\r\n\r\nWARC/1.0 fake header" + "\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
    val out = WarcSource.parse("f", evil.getBytes("US-ASCII")).toSeq
    out.map(_.warc_type) shouldBe Seq("resource", "resource")
    new String(out(1).payload, "US-ASCII") shouldBe "ok"
  }

  test("gzip archives inflate transparently and equal the plain parse") {
    val plain = WarcSource.parse("f", WarcSource.syntheticWarc(7)).toSeq
    val gz = WarcSource.parse("f", WarcSource.syntheticWarc(7, gzip = true)).toSeq
    gz.map(r => (r.seq, r.warc_type, r.target_uri, r.content_length)) shouldBe
      plain.map(r => (r.seq, r.warc_type, r.target_uri, r.content_length))
    gz.zip(plain).foreach { case (a, b) => a.payload shouldBe b.payload }
  }

  test("malformed tails surface as a __parse_error marker, not a silent short read") {
    val good = WarcSource.syntheticWarc(3)
    val truncated = good.take(good.length - 30) // cut inside the last payload
    val out = WarcSource.parse("f", truncated).toSeq
    out.count(_.warc_type == "response") shouldBe 2
    out.last.warc_type shouldBe "__parse_error"
    // non-WARC junk is one marker record
    WarcSource.parse("f", "not a warc at all".getBytes)
      .toSeq.map(_.warc_type) shouldBe Seq("__parse_error")
  }

  test("property: arbitrary binary payloads (CRLFs, fake headers, high bytes) round-trip") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def build(payloads: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      payloads.zipWithIndex.foreach { case (p, i) =>
        out.write(("WARC/1.0\r\nWARC-Type: resource\r\n" +
          s"WARC-Record-ID: <urn:uuid:r$i>\r\n" +
          s"Content-Length: ${p.length}\r\n\r\n").getBytes(ascii))
        out.write(p)
        out.write("\r\n\r\n".getBytes(ascii))
      }
      out.toByteArray
    }
    // payloads biased toward parser-confusing content: CRLFCRLF runs and
    // embedded WARC version lines, plus arbitrary (incl. high/zero) bytes
    val evilChunk = Gen.oneOf(
      Gen.const("\r\n\r\n".getBytes(ascii)),
      Gen.const("WARC/1.0\r\nContent-Length: 99\r\n\r\n".getBytes(ascii)),
      Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))
    val payloadGen = Gen.chooseNum(0, 4)
      .flatMap(n => Gen.listOfN(n, evilChunk).map(_.flatten.toArray))
    val prop = Prop.forAll(Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, payloadGen))) { ps =>
      val recs = WarcSource.parse("f", build(ps)).toSeq
      recs.length == ps.length &&
        recs.forall(_.warc_type == "resource") &&
        recs.map(_.payload.toSeq) == ps.map(_.toSeq)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    withClue(res.status.toString)(res.passed shouldBe true)
  }

  test("multi-hundred-MB gzip archive streams record-by-record (no whole-file buffer)") {
    // 1500 records x 150 KB incompressible payload ≈ 225 MB inflated — far
    // above any per-record allocation, written to disk STREAMING (the test
    // heap never holds the archive either). The old binaryFile+gunzipAll
    // path materialized all of it per task; the streaming walk holds one
    // record at a time, so peak live payload is ~150 KB.
    val tmp = java.nio.file.Files.createTempDirectory("warc_big")
    val f = tmp.resolve("big.warc.gz")
    val os = java.nio.file.Files.newOutputStream(f)
    try WarcSource.writeSyntheticWarc(os, n = 1500, gzip = true,
      payloadBytes = 150 * 1024)
    finally os.close()
    val df = WarcSource.read(spark, f.toString)
    val stats = df.groupBy("warc_type").count().as[(String, Long)]
      .collect().toMap
    stats("response") shouldBe 1500L
    stats("warcinfo") shouldBe 1L
    stats.keySet should not contain "__parse_error"
    // spot-check payload integrity at both ends of the archive: the
    // xorshift filler is reproducible, so byte-level corruption or a
    // desynced walk cannot hide behind counts
    def expected(i: Int): Array[Byte] = {
      val arr = new Array[Byte](150 * 1024)
      var x = i * 2654435761L + 1
      var j = 0
      while (j < arr.length) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; arr(j) = x.toByte; j += 1
      }
      arr
    }
    val picked = df.filter($"seq".isin(1, 1500))
      .as[WarcSource.WarcRecord].collect().sortBy(_.seq)
    picked.map(_.seq) shouldBe Array(1, 1500)
    WarcSource.httpBody(picked(0).payload) shouldBe expected(1)
    WarcSource.httpBody(picked(1).payload) shouldBe expected(1500)
  }

  test("oversize records are skipped in-stream with a visible marker, walk continues") {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val out = new java.io.ByteArrayOutputStream()
    def rec(len: Int, tag: String): Unit = {
      out.write(("WARC/1.0\r\nWARC-Type: resource\r\n" +
        s"WARC-Record-ID: <urn:uuid:$tag>\r\n" +
        s"Content-Length: $len\r\n\r\n").getBytes(ascii))
      out.write(Array.fill[Byte](len)('z'))
      out.write("\r\n\r\n".getBytes(ascii))
    }
    rec(10, "small-a"); rec(5000, "huge"); rec(7, "small-b")
    val recs = WarcSource.parseStream("f",
      new java.io.ByteArrayInputStream(out.toByteArray),
      maxRecordBytes = 1000L).toSeq
    recs.map(_.warc_type) shouldBe Seq("resource", "__oversize", "resource")
    recs(1).content_length shouldBe 5000L
    recs(1).payload shouldBe empty
    recs(2).record_id shouldBe "<urn:uuid:small-b>" // walk resynced after skip
    // oversize record truncated by EOF mid-skip → parse_error, not a hang
    val cut = out.toByteArray.take(out.size - 2000)
    val recs2 = WarcSource.parseStream("f",
      new java.io.ByteArrayInputStream(cut), maxRecordBytes = 1000L).toSeq
    recs2.map(_.warc_type) shouldBe Seq("resource", "__parse_error")
  }

  test("distributed read over a directory, httpBody strips the HTTP envelope") {
    val tmp = java.nio.file.Files.createTempDirectory("warc_spec")
    java.nio.file.Files.write(tmp.resolve("a.warc"), WarcSource.syntheticWarc(4))
    java.nio.file.Files.write(tmp.resolve("b.warc.gz"),
      WarcSource.syntheticWarc(4, gzip = true))
    val df = WarcSource.read(spark, tmp.toString)
    df.count() shouldBe 10 // (1 warcinfo + 4 responses) x 2 files
    val bodies = df.filter($"warc_type" === "response" && !$"file".endsWith(".gz"))
      .orderBy("seq")
      .as[WarcSource.WarcRecord].collect()
      .map(r => new String(WarcSource.httpBody(r.payload), "US-ASCII"))
    bodies.head shouldBe "<html><body>doc 1 xxx</body></html>"
    bodies.foreach(b => b should startWith("<html>"))
  }
}
