package graft

import graft.operators.{Decontaminate, Redaction}
import org.apache.spark.sql.functions._

class RedactionSpec extends SparkTestBase {
  import spark.implicits._

  test("detect counts emails, IPv4s, and phone-like runs") {
    val df = Seq(
      (1L, "mail a@b.co and c.d+x@e-f.org, server 192.168.0.1, call +44 20 7946 0958"),
      (2L, "no pii here at all"),
      (3L, "10.0.0.1 and 10.0.0.2")
    ).toDF("doc_id", "text")
    val m = Redaction.detect(df)
      .select($"doc_id", $"n_emails", $"n_ipv4", $"n_phones")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    // n_phones = 2: detection counts are independent per pattern, and a
    // long dotted quad is also a phone-like digit run — redaction order
    // (email → IP → phone) is what resolves the precedence, not detect().
    m(1L) shouldBe ((2, 1, 2))
    m(2L) shouldBe ((0, 0, 0))
    m(3L) shouldBe ((0, 2, 0))
  }

  test("redact replaces every occurrence and leaves clean text untouched") {
    val df = Seq(
      (1L, "write a@b.co or c@d.io from 10.1.2.3"),
      (2L, "clean text stays")
    ).toDF("doc_id", "text")
    val out = Redaction.redact(df).select($"doc_id", $"text_redacted")
      .as[(Long, String)].collect().toMap
    out(1L) shouldBe "write [EMAIL] or [EMAIL] from [IP]"
    out(2L) shouldBe "clean text stays"
  }

  test("decontamination flags exact and near matches, clean() drops them") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),          // exact
      (2L, "the quick brown fox jumps over the lazy dog today"),    // near (superset)
      (3L, "completely unrelated text about spark and parquet files")
    ).toDF("doc_id", "text")

    val ov = Decontaminate.overlap(docs, bench, "doc_id", minOverlapFrac = 0.5)
      .select($"doc_id", $"contaminated").as[(Long, Boolean)].collect().toMap
    ov(1L) shouldBe true
    ov(2L) shouldBe true   // 7 of 8 shingles shared ≥ 0.5
    ov(3L) shouldBe false

    val cleaned = Decontaminate.clean(docs, bench, "doc_id", minOverlapFrac = 0.5)
      .select($"doc_id").as[Long].collect().sorted
    cleaned shouldBe Array(3L)

    // a strict threshold keeps the near-match
    val strict = Decontaminate.overlap(docs, bench, "doc_id", minOverlapFrac = 0.999)
      .select($"doc_id", $"contaminated").as[(Long, Boolean)].collect().toMap
    strict(1L) shouldBe true
    strict(2L) shouldBe false
  }

  test("fuzzy decontamination matches paraphrased leakage across sets only") {
    val base = (0 until 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),                                               // leaked verbatim
      (2L, base + " with a small appended tail"),               // paraphrased leak
      (3L, (100 until 130).map(i => s"tok$i").mkString(" ")),   // unrelated
      (4L, base)                                                // corpus-internal dup of 1
    ).toDF("doc_id", "text")
    val bench = Seq((900L, base)).toDF("bench_id", "text")

    val hits = Decontaminate.fuzzyOverlap(docs, bench, "doc_id", minJaccard = 0.7)
      .as[(Long, Long, Double)].collect()
    hits.map(h => (h._1, h._2)).toSet shouldBe Set((1L, 900L), (2L, 900L), (4L, 900L))
    hits.find(_._1 == 1L).get._3 shouldBe 1.0 +- 1e-12  // exact leak: J = 1
    // NO corpus-internal pair (1,4) is ever produced — cross-set only

    val cleaned = Decontaminate.cleanFuzzy(docs, bench, "doc_id", minJaccard = 0.7)
      .select($"doc_id").as[Long].collect().sorted
    cleaned shouldBe Array(3L)

    an[IllegalArgumentException] should be thrownBy
      Decontaminate.fuzzyOverlap(docs, bench, "doc_id", minJaccard = 1.5)
  }

  test("decontamination keeps the per-doc row for null and too-short texts") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, null.asInstanceOf[String]),   // null text → null shingles
      (3L, "tiny")                       // < n tokens → one all-tokens shingle
    ).toDF("doc_id", "text")

    val ov = Decontaminate.overlap(docs, bench, "doc_id", minOverlapFrac = 0.5)
      .select($"doc_id", $"n_shingles", $"n_matched", $"contaminated")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    // every input doc appears exactly once — no rows vanish on explode
    ov.keySet shouldBe Set(1L, 2L, 3L)
    ov(2L) shouldBe ((0, 0L, false))
    ov(3L) shouldBe ((1, 0L, false))
    ov(1L)._3 shouldBe true

    // and clean() retains the null/short docs while dropping the match
    val cleaned = Decontaminate.clean(docs, bench, "doc_id", minOverlapFrac = 0.5)
      .select($"doc_id").as[Long].collect().sorted
    cleaned shouldBe Array(2L, 3L)
  }

  test("html cleaning strips tags, decodes entities, drops urls, collapses spaces") {
    import graft.operators.TextCleaning
    val df = Seq(
      (1L, "<div><b>Tom &amp; Jerry</b> say &quot;hi&quot;</div>"),
      (2L, "read https://a.io/x and http://b.co/y?z=1 now"),
      (3L, "plain text stays exactly as is"),
      (4L, "double  escape &amp;lt; stays literal")
    ).toDF("doc_id", "text")
    val out = TextCleaning.clean(df)
      .select($"doc_id", $"n_urls", $"text_clean")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    out(1L) shouldBe ((0, "Tom & Jerry say \"hi\""))
    out(2L) shouldBe ((2, "read and now"))
    out(3L) shouldBe ((0, "plain text stays exactly as is"))
    out(4L) shouldBe ((0, "double escape &lt; stays literal"))

    // an end-of-line URL must not swallow the newline and the next word
    val multiline = TextCleaning.clean(
      Seq((9L, "see https://a.io\nnext steps")).toDF("doc_id", "text"))
      .select($"text_clean").as[String].head()
    multiline should include("next steps")
  }

  test("confusable skeleton boundary: mapped homoglyphs fold, unmapped ones pass through") {
    import graft.operators.TextCleaning
    def sk(s: String): String = Seq(Tuple1(s)).toDF("text")
      .select(TextCleaning.confusableSkeleton($"text")).as[String].head()
    // mapped: Cyrillic о (U+043E) and Greek ο (U+03BF) fold to Latin o —
    // the spoofed twin skeletons collide
    sk("gооd wοrd") shouldBe sk("good word")
    // boundary pin: the map is a deliberate high-frequency TR39 SUBSET
    // (doc on confusableFrom) — Greek α (U+03B1), a TR39 confusable of
    // 'a' that is NOT in the subset, must pass through UNCHANGED rather
    // than silently folding; widening the map is a conscious decision
    // that must land in the oracle's literal translate too
    sk("dαta") should not be sk("data")
    sk("dαta") shouldBe "dαta"
  }

  test("repetition signals measure duplicated lines and 2-grams") {
    val docs = Seq(
      (1L, "spam spam spam spam"),                 // 3 identical 2-grams
      (2L, "all words differ here now"),           // no repetition
      (3L, "line one\nline two\nline one\n\n")     // 1 duplicate line of 3
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.repetitionSignals(docs)
      .select($"doc_id", $"dup_line_frac", $"dup_2gram_frac")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    out(1L)._2 shouldBe 2.0 / 3.0 +- 1e-6    // "spam spam" x3 → 2 dups of 3
    out(2L) shouldBe ((0.0, 0.0))
    out(3L)._1 shouldBe 1.0 / 3.0 +- 1e-6
  }
}
