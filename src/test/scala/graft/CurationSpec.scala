package graft

import graft.operators.{PassageDedup, TextAnalysis, WebCuration}
import org.apache.spark.sql.functions._

/** Web-curation (domain extraction/blocklist), corpus-frequent n-gram
  * boilerplate detection, and quantile quality filtering.
  */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("extractDomains captures hosts, lowercased, punctuation-stripped, in order") {
    val out = Seq(
      (1L, "see https://A.Example.com/x and http://b.io, plus https://c.net\"quoted\""),
      (2L, "no urls"),
      (3L, "ftp://skipped.com and https://kept.org/path?q=1"),
      (4L, "(https://paren.com) then https://dotted.net. then https://?!")
    ).toDF("doc_id", "text")
      .select($"doc_id", WebCuration.extractDomains($"text").alias("d"))
      .as[(Long, Seq[String])].collect().toMap
    out(1L) shouldBe Seq("a.example.com", "b.io", "c.net")
    out(2L) shouldBe Seq.empty
    out(3L) shouldBe Seq("kept.org")
    // trailing ')' and '.' stripped; the all-punctuation URL drops entirely
    out(4L) shouldBe Seq("paren.com", "dotted.net")
  }

  test("blocklistFilter catches a blocked domain hidden behind trailing punctuation") {
    val docs = Seq(
      (1L, "as seen on https://evil.com, a bad site"),
      (2L, "fine text https://good.org.")
    ).toDF("doc_id", "text")
    val kept = WebCuration.blocklistFilter(docs, Seq("evil.com").toDF("domain"), "doc_id")
      .select($"doc_id").as[Long].collect()
    kept shouldBe Array(2L)
  }

  test("domainStats counts docs and mentions per domain") {
    val docs = Seq(
      (1L, "https://a.com/x https://a.com/y https://b.org/z"),
      (2L, "https://a.com/q"),
      (3L, "nothing")
    ).toDF("doc_id", "text")
    val stats = WebCuration.domainStats(docs, "doc_id")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    stats("a.com") shouldBe ((2L, 3L))
    stats("b.org") shouldBe ((1L, 1L))
    stats.keySet shouldBe Set("a.com", "b.org")
  }

  test("blocklistFilter drops exact and subdomain matches, keeps the rest") {
    val docs = Seq(
      (1L, "cites https://evil.com/spam"),
      (2L, "cites https://sub.evil.com/worse"),
      (3L, "cites https://notevil.com/fine"),
      (4L, "cites https://good.org/ok"),
      (5L, "no urls at all")
    ).toDF("doc_id", "text")
    val kept = WebCuration.blocklistFilter(docs, Seq("evil.com").toDF("domain"), "doc_id")
      .select($"doc_id").as[Long].collect().sorted
    kept shouldBe Array(3L, 4L, 5L)
    an[IllegalArgumentException] should be thrownBy
      WebCuration.blocklistFilter(docs, docs, "doc_id")
  }

  test("boilerplate stats flag docs dominated by corpus-frequent n-grams") {
    val boiler = "all rights reserved contact us for details"
    val docs = (1L to 6L).map(i => (i, s"$boiler unique$i tail$i"))
      .toDF("doc_id", "text")
      .unionByName(Seq(
        (10L, "a genuinely original text with no shared phrasing at all whatsoever"),
        (11L, null.asInstanceOf[String]),
        (12L, "too short")).toDF("doc_id", "text"))
    val stats = PassageDedup.boilerplateStats(docs, "doc_id", n = 3, minDf = 5,
      maxFrac = 0.5)
      .select($"doc_id", $"n_grams", $"n_frequent", $"boilerplate")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // every input doc keeps a row, including null/short texts
    stats.keySet shouldBe (1L to 6L).toSet ++ Set(10L, 11L, 12L)
    // the boilerplate prefix contributes 5 shared 3-grams present in 6 docs
    (1L to 6L).foreach { i => stats(i)._3 shouldBe true }
    stats(10L) shouldBe ((9L, 0L, false))
    stats(11L) shouldBe ((0L, 0L, false))
    stats(12L) shouldBe ((0L, 0L, false))

    val cleaned = PassageDedup.dropBoilerplate(docs, "doc_id", n = 3, minDf = 5,
      maxFrac = 0.5).select($"doc_id").as[Long].collect().sorted
    cleaned shouldBe Array(10L, 11L, 12L)
  }

  test("quantile quality filter keeps per-stratum top mass; approx tracks exact") {
    // two strata with disjoint score ranges: a global threshold would wipe
    // out stratum "low" entirely; the per-stratum filter keeps 75% of each
    val docs = spark.range(1000).select(
      when($"id" % 2 === 0, "high").otherwise("low").alias("lang"),
      ($"id" % 2 * 1000 + $"id" % 100).cast("double").alias("score"),
      $"id")
    val kept = TextAnalysis.quantileQualityFilter(docs, "lang", "score",
      p = 0.25, exact = true)
    val counts = kept.groupBy($"lang").count().as[(String, Long)].collect().toMap
    counts("high").toDouble shouldBe 375.0 +- 10
    counts("low").toDouble shouldBe 375.0 +- 10

    val approx = TextAnalysis.quantileQualityFilter(docs, "lang", "score", p = 0.25)
    val ac = approx.groupBy($"lang").count().as[(String, Long)].collect().toMap
    ac("high").toDouble shouldBe counts("high").toDouble +- 15
    ac("low").toDouble shouldBe counts("low").toDouble +- 15

    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.quantileQualityFilter(docs, "lang", "score", p = 0.0)
  }

  test("URL canonicalization collapses tracking/port/fragment/case variants, preserves real distinctions") {
    import graft.operators.WebCuration
    val urls = Seq(
      "https://Example.com:443/a/?utm_source=x&id=7#frag",
      "https://example.com/a?id=7",
      "http://example.com:80/a/",
      "http://example.com/a",
      "https://example.com/a?utm_a=1&utm_b=2&id=7",
      "https://example.com/CaseSensitive/Path",
      "https://example.com/?utm_only=1",
      "https://example.com:8080/a"
    ).toDF("url")
    val out = urls.select(WebCuration.canonicalizeUrl($"url")).as[String].collect()
    out(0) shouldBe "https://example.com/a/?id=7"
    out(1) shouldBe "https://example.com/a?id=7"
    out(2) shouldBe "http://example.com/a"
    out(3) shouldBe "http://example.com/a"
    out(4) shouldBe "https://example.com/a?id=7"
    // path case and non-default ports are REAL distinctions — preserved
    out(5) shouldBe "https://example.com/CaseSensitive/Path"
    out(6) shouldBe "https://example.com"
    out(7) shouldBe "https://example.com:8080/a"

    // extraction from prose + canonicalization compose
    val text = Seq((1L, "see https://A.com/x/, and http://b.com:80/y#z.")).toDF("doc_id", "text")
    text.select(explode(WebCuration.extractUrls($"text")).alias("u"))
      .select(WebCuration.canonicalizeUrl($"u")).as[String].collect().toSeq shouldBe
      Seq("https://a.com/x", "http://b.com/y")
  }

  test("LR quality classifier separates held-out spam from clean text, deterministically") {
    import graft.operators.QualityClassifier
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    def spam(df: org.apache.spark.sql.DataFrame) = df.select(
      ($"doc_id" + 1000000L).alias("doc_id"),
      concat_ws(" ", array_repeat(element_at(split($"text", "\\s+"), 1), 60))
        .alias("text"))
    val trainC = docs.filter($"doc_id" % 2 === 0)
    val heldC  = docs.filter($"doc_id" % 2 === 1)
    val labeled = trainC.withColumn("label", lit(1.0))
      .unionByName(spam(trainC).withColumn("label", lit(0.0)))
    val model = QualityClassifier.train(labeled, "text", "label")
    val scored = QualityClassifier.score(model, heldC.unionByName(spam(heldC)), "text")
      .select($"doc_id", $"quality_prob").cache()
    try {
      // every held-out clean doc outscores every held-out spam twin
      val minClean = scored.filter($"doc_id" < 1000000L).agg(min($"quality_prob"))
        .head().getDouble(0)
      val maxSpam = scored.filter($"doc_id" >= 1000000L).agg(max($"quality_prob"))
        .head().getDouble(0)
      minClean should be > maxSpam
      // deterministic: retraining on the same data gives the same coefficients
      val model2 = QualityClassifier.train(labeled, "text", "label")
      model2.coefficients.toArray shouldBe model.coefficients.toArray
      // scores live in [0, 1]
      scored.filter($"quality_prob" < 0.0 || $"quality_prob" > 1.0).count() shouldBe 0L
    } finally scored.unpersist()
  }

  test("blocklist screening matches whole tokens only and honors both thresholds") {
    val docs = Seq(
      (1L, "visit the casino tonight"),             // 1 hit of 4 -> frac 0.25
      (2L, "scunthorpe residents are fine"),        // substring must NOT match
      (3L, "spam spam spam and more spam"),         // 4 hits -> minHits branch
      (4L, ""), (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistTokenStats(docs, "doc_id",
        Seq("casino", "spam", "Thorpe"), minHits = 3L, maxFrac = 0.2)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    out(1L) shouldBe ((1L, 4L, 1L, 0.25, true))     // frac branch
    out(2L) shouldBe ((2L, 4L, 0L, 0.0, false))     // no Scunthorpe false positive
    out(3L) shouldBe ((3L, 6L, 4L, 4.0 / 6, true))  // minHits branch
    out(4L)._5 shouldBe false
    out(5L) shouldBe ((5L, 0L, 0L, 0.0, false))
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.blocklistTokenStats(docs, "doc_id", Nil)
  }

  test("group winsorization clamps to exact group quantiles, nulls stay null") {
    import graft.operators.Profiler
    val df = (1 to 100).map(i => ("g1", i.toLong, i.toDouble))
      .toDF("grp", "id", "v")
      .unionByName(Seq(("g2", 200L, Some(1e9)), ("g2", 201L, Some(0.0)),
        ("g2", 202L, None: Option[Double]), ("g2", 203L, Some(500.0)))
        .toDF("grp", "id", "v"))
    val out = Profiler.winsorizeByGroup(df, "grp", "v", 0.05, 0.95)
      .select($"id", $"v_w").as[(Long, Option[Double])].collect().toMap
    // g1: P5 of 1..100 (linear interp) = 5.95, P95 = 95.05
    out(1L).get shouldBe 5.95 +- 1e-9
    out(100L).get shouldBe 95.05 +- 1e-9
    out(50L).get shouldBe 50.0 +- 1e-9          // interior values untouched
    // g2 has its own bounds: the 1e9 outlier clamps near the group's P95
    out(200L).get should be < 1e9
    out(202L) shouldBe None                      // null stays null
    an[IllegalArgumentException] should be thrownBy
      Profiler.winsorizeByGroup(df, "grp", "v", 0.9, 0.1)
  }

  test("per-stratum calibration maps scores to percent ranks within each stratum") {
    val docs = Seq(
      ("web", 1L, 10.0), ("web", 2L, 20.0), ("web", 3L, 20.0), ("web", 4L, 40.0),
      ("books", 5L, 1000.0), ("books", 6L, 2000.0)
    ).toDF("source", "doc_id", "score")
    val out = TextAnalysis.calibrateByStratum(docs, "source", "score")
      .select($"doc_id", $"calibrated").as[(Long, Double)].collect().toMap
    out(1L) shouldBe 0.0
    out(2L) shouldBe out(3L)            // ties share a rank
    out(2L) shouldBe 1.0 / 3 +- 1e-12   // (rank-1)/(n-1) = 1/3
    out(4L) shouldBe 1.0
    // a books doc with a huge RAW score calibrates like any stratum min
    out(5L) shouldBe 0.0
    out(6L) shouldBe 1.0
  }

  test("line dedup keeps only the first occurrence of each repeated line") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nunique alpha\n\nshared tail"),
      (2L, "cookie banner\nunique beta\nshared tail"),   // banner differs by case -> kept
      (3L, "COOKIE BANNER\nshared tail"),                // both lines seen -> empty
      (4L, null.asInstanceOf[String]),                   // null passes through
      (5L, "  COOKIE BANNER  \nunique gamma")            // trimmed match -> banner dropped
    ).toDF("doc_id", "text")
    val out = PassageDedup.lineDedup(docs, "doc_id")
      .as[(Long, String)].collect().toMap
    out(1L) shouldBe "COOKIE BANNER\nunique alpha\n\nshared tail"
    out(2L) shouldBe "cookie banner\nunique beta"
    out(3L) shouldBe ""                        // row survives, text emptied
    out(4L) shouldBe null
    out(5L) shouldBe "unique gamma"
    out.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L)

    // structural blank lines never dedup against each other
    val blanks = Seq((1L, "a\n\nb"), (2L, "c\n\nd")).toDF("doc_id", "text")
    PassageDedup.lineDedup(blanks, "doc_id").as[(Long, String)].collect()
      .toMap apply 2L shouldBe "c\n\nd"

    // idempotent: a second pass changes nothing
    val once = PassageDedup.lineDedup(docs, "doc_id")
    val twice = PassageDedup.lineDedup(once, "doc_id")
    twice.as[(Long, String)].collect().toMap shouldBe out
  }

  test("paragraph dedup works at blank-line granularity and normalizes spacing") {
    val docs = Seq(
      (1L, "INTRO PARA\n\nbody one\nstays multiline\n\n\nOUTRO"),  // 3-\n run normalizes
      (2L, "intro para unique\n\nINTRO PARA\n\nOUTRO")
    ).toDF("doc_id", "text")
    val out = PassageDedup.paragraphDedup(docs, "doc_id")
      .as[(Long, String)].collect().toMap
    out(1L) shouldBe "INTRO PARA\n\nbody one\nstays multiline\n\nOUTRO"
    out(2L) shouldBe "intro para unique"  // both repeated paras removed
  }
}
