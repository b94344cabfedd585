package graft

import graft.functions.{TextFunctions, TextKernels}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("analyze adds all feature columns without dropping input columns") {
    val out = TextAnalysis.analyze(docs)
    out.columns should contain allOf ("doc_id", "text", "n_tokens", "n_subwords",
      "stop_ratio", "punct_ratio", "quality_score", "fingerprint_md5", "fingerprint_roll")
    out.count() shouldBe docs.count()
  }

  test("token count matches a manual split") {
    val df = Seq((1L, "a bb  ccc"), (2L, "  x ")).toDF("doc_id", "text")
    TextAnalysis.analyze(df).orderBy("doc_id")
      .select("n_tokens").as[Int].collect().toSeq shouldBe Seq(3, 1)
  }

  test("stopword ratio and punct ratio are exact on crafted input") {
    val df = Seq((1L, "the cat and the hat")).toDF("doc_id", "text")
    val r = TextAnalysis.analyze(df).select("stop_ratio", "punct_ratio").head()
    r.getDouble(0) shouldBe 0.6 +- 1e-9 // the, and, the of 5
    r.getDouble(1) shouldBe 0.0
  }

  test("quality score lands in [0,1] and penalizes noise") {
    val clean = "the quick brown fox jumps over the lazy dog and runs to the hills " * 3
    val noisy = "@@@@ #### !!!! %%%% ^^^^ &&&& **** (((( ))))"
    val df = Seq((1L, clean), (2L, noisy)).toDF("doc_id", "text")
    val scores = TextAnalysis.analyze(df).orderBy("doc_id")
      .select("quality_score").as[Double].collect()
    all(scores.toSeq) should (be >= 0.0 and be <= 1.0)
    scores(0) should be > scores(1)
  }

  test("language ID picks the profile language on clear inputs") {
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "el gato de la casa es un amigo y se va por los campos"),
      (3L, "der Hund ist von den Bergen und die Sonne ist mit uns"),
      (4L, "le chat et les chiens du village sont une famille"),
      (5L, "这是一个很好的例子我们都有")
    ).toDF("doc_id", "text")
    TextAnalysis.withLanguage(df).orderBy("doc_id")
      .select("lang_pred").as[String].collect().toSeq shouldBe
      Seq("en", "es", "de", "fr", "zh")
  }

  test("term frequencies count every token occurrence") {
    val df = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val tf = TextAnalysis.termFrequencies(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    tf shouldBe Map("a" -> 2L, "b" -> 2L, "c" -> 1L)
    val dfreq = TextAnalysis.documentFrequencies(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    dfreq shouldBe Map("a" -> 1L, "b" -> 2L, "c" -> 1L)
  }

  test("rolling hash kernel matches the column expression") {
    val s = "hello world"
    val viaKernel = TextKernels.rollingHash(UTF8String.fromString(s))
    val viaCol = Seq(s).toDF("t")
      .select(TextFunctions.rollingHash($"t")).as[Long].head()
    viaCol shouldBe viaKernel
  }

  test("shingles produce n-grams; short docs fall back to one shingle") {
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val sh = df.select($"doc_id",
      TextFunctions.shingles(TextFunctions.tokens($"text"), 3).alias("sh"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    sh(0)._2 shouldBe Seq("a b c", "b c d")
    sh(1)._2 shouldBe Seq("a b")
  }

  test("sequence packing fills contiguous bins up to the token budget") {
    import spark.implicits._
    val docs = Seq(
      (1L, 100L), (2L, 500L), (3L, 600L),   // bin 0: cum_before 0,100,600
      (4L, 900L),                            // cum_before 1200 -> bin 1
      (5L, 3000L),                           // cum_before 2100 -> bin 2 (oversized doc)
      (6L, 10L)                              // cum_before 5100 -> bin 5
    ).toDF("doc_id", "n_tokens")
    val out = graft.operators.TextAnalysis
      .packSequences(docs, "doc_id", "n_tokens", 1000L, numShards = 1)
      .select($"doc_id", $"bin_id").as[(Long, Long)].collect().toMap
    out(1L) shouldBe 0L
    out(2L) shouldBe 0L
    out(3L) shouldBe 0L
    out(4L) shouldBe 1L
    out(5L) shouldBe 2L
    out(6L) shouldBe 5L

    // invariant: bin ids are monotone in the ordering column
    val seqd = graft.operators.TextAnalysis
      .packSequences(docs, "doc_id", "n_tokens", 1000L, numShards = 1)
      .orderBy("doc_id").select($"bin_id").as[Long].collect()
    seqd.sliding(2).foreach { case Array(a, b) => a should be <= b; case _ => }
  }

  test("sharded packing parallelizes: per-shard bins, no global window") {
    import spark.implicits._
    val docs = spark.range(1, 10001).select(
      $"id".alias("doc_id"), (pmod($"id" * 37L, lit(400L)) + 1L).alias("n_tokens"))
    val packed = graft.operators.TextAnalysis
      .packSequences(docs, "doc_id", "n_tokens", 2048L, numShards = 8)
    val rows = packed.select($"shard", $"doc_id", $"bin_id", $"n_tokens")
      .as[(Long, Long, Long, Long)].collect()

    // nothing lost, every row gets a shard in range and a bin
    rows.length shouldBe 10000
    rows.map(_._1).distinct.sorted shouldBe (0L until 8L).toArray
    // within each shard, bins are monotone in doc_id and start at 0
    rows.groupBy(_._1).foreach { case (_, shardRows) =>
      val ordered = shardRows.sortBy(_._2).map(_._3)
      ordered.head shouldBe 0L
      ordered.sliding(2).foreach { case Array(a, b) => a should be <= b; case _ => }
    }
    // per-(shard,bin) token totals respect budget + one straddler (≤400)
    rows.groupBy(r => (r._1, r._3)).foreach { case (_, binRows) =>
      binRows.map(_._4).sum should be <= (2048L + 400L)
    }

    // the physical plan must not contain a single-partition window Exchange
    val plan = packed.queryExecution.executedPlan.toString
    plan should include("hashpartitioning")
    plan should not include "SinglePartition"
  }

  test("packSequences guards its output columns but accepts an explicit shard column") {
    import spark.implicits._
    val docs = Seq((1L, 10L, 0L), (2L, 20L, 1L)).toDF("doc_id", "n_tokens", "shard")
    // explicit shard param referencing the caller's own column: allowed
    val out = graft.operators.TextAnalysis.packSequences(docs, "doc_id", "n_tokens",
      1000L, numShards = 2, shard = Some(col("shard")))
    out.select($"shard").distinct().as[Long].collect().sorted shouldBe Array(0L, 1L)
    // without the param, a pre-existing 'shard' column must not be clobbered
    an[IllegalArgumentException] should be thrownBy
      graft.operators.TextAnalysis.packSequences(docs, "doc_id", "n_tokens", 1000L)
    // 'bin_id' is always reserved
    an[IllegalArgumentException] should be thrownBy
      graft.operators.TextAnalysis.packSequences(
        docs.withColumnRenamed("shard", "bin_id"), "doc_id", "n_tokens", 1000L)
  }

  test("concat-and-chunk: boundary map exact, full sequences everywhere but the tail") {
    import spark.implicits._
    // one shard, L=10. Stream: d1(4) d2(10) d3(3) d4(13) -> offsets
    // 0,4,14,17; d2 spans seqs 0-1 (6+4), d4 spans 1-2-3 (3+10? no: off 17,
    // end 30 -> seqs 1..2): verify piece algebra row by row
    val docs = Seq((1L, 4L), (2L, 10L), (3L, 3L), (4L, 13L))
      .toDF("doc_id", "n_tokens")
    val out = graft.operators.TextAnalysis.chunkConcatenated(
        docs, "doc_id", "n_tokens", seqLen = 10L, numShards = 1)
      .select($"doc_id", $"seq_id", $"piece_start", $"piece_len")
      .as[(Long, Long, Long, Long)].collect().sorted
    out shouldBe Seq(
      (1L, 0L, 0L, 4L),              // [0,4)
      (2L, 0L, 0L, 6L), (2L, 1L, 6L, 4L),   // [4,14) splits at 10
      (3L, 1L, 0L, 3L),              // [14,17)
      (4L, 1L, 0L, 3L), (4L, 2L, 3L, 10L))  // [17,30) splits at 20; tail short

    // invariants at scale: pieces per doc sum to the doc's tokens; every
    // (shard, seq) except each shard's last sums to exactly L
    val big = spark.range(500).select($"id".alias("doc_id"),
      (pmod($"id" * 7919, lit(97)) + 1).alias("n_tokens"))
    val chunked = graft.operators.TextAnalysis.chunkConcatenated(
      big, "doc_id", "n_tokens", seqLen = 256L, numShards = 4)
    chunked.groupBy($"doc_id").agg(sum($"piece_len").alias("s"))
      .join(big, Seq("doc_id"))
      .filter($"s" =!= $"n_tokens").count() shouldBe 0L
    val perSeq = chunked.groupBy($"shard", $"seq_id")
      .agg(sum($"piece_len").alias("s"))
    val lastSeq = perSeq.groupBy($"shard").agg(max($"seq_id").alias("last"))
    perSeq.join(lastSeq, Seq("shard"))
      .filter($"seq_id" =!= $"last" && $"s" =!= 256L).count() shouldBe 0L

    // zero-token and null docs occupy no sequence
    val withEmpty = docs.unionByName(Seq((9L, 0L)).toDF("doc_id", "n_tokens"))
    graft.operators.TextAnalysis.chunkConcatenated(
        withEmpty, "doc_id", "n_tokens", 10L, numShards = 1)
      .filter($"doc_id" === 9L).count() shouldBe 0L

    // a caller-supplied shard is honored even at numShards = 1 (it used
    // to be silently ignored): odd/even shards each restart offsets at 0
    val sharded = graft.operators.TextAnalysis.chunkConcatenated(
        docs, "doc_id", "n_tokens", 10L, numShards = 1,
        shard = Some(pmod($"doc_id", lit(2))))
      .select($"shard").distinct().as[Long].collect().sorted
    sharded shouldBe Seq(0L, 1L)

    // duplicate orderCol within a shard breaks offset determinism — the
    // in-plan guard raises a NAMED error instead of silently picking an
    // arbitrary cumsum order
    val dup = Seq((1L, 4L), (1L, 5L)).toDF("doc_id", "n_tokens")
    val e = intercept[Exception] {
      graft.operators.TextAnalysis.chunkConcatenated(
        dup, "doc_id", "n_tokens", 10L, numShards = 1).collect()
    }
    e.getMessage should include("duplicate doc_id")
  }

  test("source mixing hits target ratios without upsampling, deterministically") {
    import spark.implicits._
    val docs = spark.range(30000).select(
      when(col("id") % 3 === 0, "web")
        .when(col("id") % 3 === 1, "books").otherwise("code").alias("source"),
      col("id"))
    val mixed = graft.operators.TextAnalysis.mixSources(docs, "source",
      Map("web" -> 0.6, "books" -> 0.3, "code" -> 0.1))
    val counts = mixed.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    val total = counts.values.sum.toDouble
    // 10k per source; web is the constraint: total ≈ 10k/0.6 ≈ 16.7k
    counts("web").toDouble / total shouldBe 0.6 +- 0.05
    counts("books").toDouble / total shouldBe 0.3 +- 0.05
    counts("code").toDouble / total shouldBe 0.1 +- 0.05
    counts.values.foreach(_ should be <= 10000L) // never upsamples

    // deterministic for a fixed seed and input
    val again = graft.operators.TextAnalysis.mixSources(docs, "source",
      Map("web" -> 0.6, "books" -> 0.3, "code" -> 0.1))
    again.count() shouldBe mixed.count()

    // unknown sources are dropped
    val dropped = graft.operators.TextAnalysis.mixSources(docs, "source",
      Map("web" -> 1.0))
    dropped.select($"source").distinct().as[String].collect().toSeq shouldBe Seq("web")
  }

  test("temperature mixing rebalances toward uniform as alpha shrinks") {
    // 16k web vs 1k code: natural ratio 16:1; alpha=0.5 targets sqrt
    // ratio 4:1; the no-upsample constraint binds on the small source
    val docs = spark.range(17000).select(
      when($"id" < 16000, "web").otherwise("code").alias("source"), $"id")
    val mixed = graft.operators.TextAnalysis
      .mixSourcesTemperature(docs, "source", alpha = 0.5)
    val counts = mixed.groupBy($"source").count().as[(String, Long)].collect().toMap
    val total = counts.values.sum.toDouble
    // weights: sqrt(16000)=126.5, sqrt(1000)=31.6 → web target ≈ 0.8
    counts("web").toDouble / total shouldBe 0.8 +- 0.05
    counts("code").toDouble / total shouldBe 0.2 +- 0.05
    counts("code") should be <= 1000L
    // alpha = 1 reproduces (a sample of) natural proportions
    val natural = graft.operators.TextAnalysis
      .mixSourcesTemperature(docs, "source", alpha = 1.0)
    val nc = natural.groupBy($"source").count().as[(String, Long)].collect().toMap
    nc("web").toDouble / nc.values.sum shouldBe (16.0 / 17) +- 0.05
    an[IllegalArgumentException] should be thrownBy
      graft.operators.TextAnalysis.mixSourcesTemperature(docs, "source", 0.0)
  }

  test("bigram perplexity matches a driver-side reference; held-out and short docs handled") {
    val rows = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the cat sat on the mat"),
      (2L, "zebra quantum flux anomaly"),
      (3L, "single")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramPerplexity(rows, "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    // no-bigram doc absent; identical docs score identically; rare bigrams
    // (count 1 vs 2 for the repeated text) perplex more
    out.keySet shouldBe Set(0L, 1L, 2L)
    out(0L) shouldBe out(1L)
    out(2L)._2 should be > out(0L)._2

    // driver reference for doc 0 with add-one smoothing over the full corpus
    val docs = Seq("the cat sat on the mat", "the cat sat on the mat",
      "zebra quantum flux anomaly", "single").map(_.split("\\s+").toSeq)
    val bigrams = docs.flatMap(t => t.zip(t.drop(1)))
    val cbt = bigrams.groupBy(identity).view.mapValues(_.size).toMap
    val cp  = bigrams.groupBy(_._1).view.mapValues(_.size).toMap
    val v   = docs.flatten.distinct.size
    val d0  = docs.head.zip(docs.head.drop(1))
    val ref = math.exp(d0.map(b =>
      -math.log((cbt(b) + 1.0) / (cp(b._1) + v))).sum / d0.size)
    out(0L)._1 shouldBe d0.size.toLong
    out(0L)._2 shouldBe ref +- 1e-9

    // held-out scoring against a separate LM corpus: unseen bigrams get the
    // smoothed floor instead of exploding or dropping out
    val lm = Seq((100L, "totally different training text corpus")).toDF("doc_id", "text")
    val held = TextAnalysis.bigramPerplexity(rows, "doc_id", lmCorpus = Some(lm))
    held.count() shouldBe 3L
    held.filter($"ppl".isNull || $"ppl" <= 0.0).count() shouldBe 0L
  }

  test("deflate compression ratio orders repetitive < prose < noise, deterministic") {
    import graft.functions.TextFunctions
    val rows = Seq(
      (0L, Seq.fill(300)("spam").mkString(" ")),
      (1L, "the quick brown fox jumps over the lazy dog and keeps running through the quiet field"),
      (2L, (0 until 300).map(i => ((i * 2654435761L) % 0xFFFFFF).toHexString).mkString(" ")),
      (3L, "")
    ).toDF("doc_id", "text")
    val r = rows.select($"doc_id", TextFunctions.deflateRatio($"text").alias("r"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r(0L) should be < 0.1          // repeated token collapses
    r(0L) should be < r(1L)        // spam < natural prose
    r(0L) should be < r(2L)        // spam < high-entropy noise
    r(2L) should be > 0.4
    r(3L) shouldBe 1.0             // empty text: neutral
    // deterministic across invocations
    val again = rows.select(TextFunctions.deflateRatio($"text")).collect()
    rows.select(TextFunctions.deflateRatio($"text")).collect() shouldBe again
  }

  test("document chunking: overlap, coverage, tail chunk, short docs") {
    val words = (0 until 25).map(i => s"w$i")
    val rows = Seq((1L, words.mkString(" ")), (2L, "tiny doc")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(rows, "doc_id", chunkTokens = 10, overlapTokens = 3)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, String, Long)].collect()

    val d1 = out.filter(_._1 == 1L)
    // stride 7 over 25 tokens -> starts 0,7,14,21 -> 4 chunks
    d1.map(_._2).toSeq shouldBe Seq(0L, 1L, 2L, 3L)
    d1(0)._3 shouldBe words.slice(0, 10).mkString(" ")
    d1(1)._3 shouldBe words.slice(7, 17).mkString(" ")
    // consecutive chunks share exactly the 3-token overlap
    d1(0)._3.split(" ").takeRight(3) shouldBe d1(1)._3.split(" ").take(3)
    // tail chunk is short, length reported correctly
    d1(3)._3 shouldBe words.slice(21, 25).mkString(" ")
    d1(3)._4 shouldBe 4L
    // every token position is covered by at least one chunk
    d1.flatMap(c => c._3.split(" ")).distinct.sorted shouldBe words.sorted
    // a doc shorter than one chunk yields exactly one full-doc chunk
    val d2 = out.filter(_._1 == 2L)
    d2.map(c => (c._2, c._3, c._4)).toSeq shouldBe Seq((0L, "tiny doc", 2L))
  }

  test("DSIR log-weights rank target-like documents above off-domain ones") {
    val targetish = "spark sql engine shuffles partition columns"
    val noise = "zx qv wk jn plo mrt uuv"
    val raw = Seq(
      (1L, targetish), (2L, targetish + " and more spark sql"),
      (3L, noise), (4L, noise + " zx qv"),
      (5L, ""), // no tokens: row kept with weight 0
      (6L, "spark sql " + noise) // mixed
    ).toDF("doc_id", "text")
    val target = Seq((100L, targetish), (101L, "spark sql engine partition"))
      .toDF("doc_id", "text")
    val w = TextAnalysis.dsirLogWeights(raw, target, "doc_id")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap

    w.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L, 6L)
    w(5L) shouldBe ((0L, 0.0))
    // per-gram average: target-like docs strictly above noise docs, mixed between
    def avg(id: Long) = w(id)._2 / w(id)._1
    avg(1L) should be > avg(6L)
    avg(6L) should be > avg(3L)
    avg(2L) should be > avg(4L)
    // n_grams = unigrams + bigrams
    w(1L)._1 shouldBe (6L + 5L)

    // weights are deterministic and partitioning-independent
    val again = TextAnalysis.dsirLogWeights(raw.repartition(7), target, "doc_id")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    again.keys.foreach(k => again(k)._2 shouldBe w(k)._2 +- 1e-9)
  }

  test("BM25 matches the hand-computed formula and ranks sensibly") {
    val docs = Seq(
      (1L, "apple banana apple"), (2L, "apple"), (3L, "cherry plum"),
      (4L, "banana " + (0 until 50).map(_ => "filler").mkString(" "))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Scores(docs, "doc_id", Seq("apple", "banana"))
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap

    // driver-side reference: N=4, dl = 3,1,2,51, avgdl = 57/4
    val (n, avgdl, k1, b) = (4.0, 57.0 / 4, 1.2, 0.75)
    def idf(df: Long) = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def s(tf: Long, df: Long, dl: Long) =
      idf(df) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    out(1L)._2 shouldBe (s(2, 2, 3) + s(1, 2, 3)) +- 1e-9 // apple tf=2, banana tf=1
    out(2L)._2 shouldBe s(1, 2, 1) +- 1e-9
    out(4L)._2 shouldBe s(1, 2, 51) +- 1e-9
    out.contains(3L) shouldBe false // no query term -> absent
    out(1L)._1 shouldBe 3L          // n_hits counts occurrences

    // short match beats long padded match (length normalization works)
    out(2L)._2 should be > out(4L)._2

    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.bm25Scores(docs, "doc_id", Seq("Apple", "apple"))
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.bm25Scores(docs, "doc_id", Nil)
  }

  test("script signals count code points per Unicode script") {
    val rows = Seq(
      (1L, "abc 中文 123 где"),
      (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "naïve café")   // accented chars are Latin script
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scriptSignals(rows, "doc_id")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val r1 = out(1L)
    r1._2 shouldBe 11L
    r1._3 shouldBe 3.0 / 11 +- 1e-12  // latin
    r1._4 shouldBe 2.0 / 11 +- 1e-12  // han
    r1._5 shouldBe 3.0 / 11 +- 1e-12  // cyrillic
    r1._6 shouldBe 3.0 / 11 +- 1e-12  // digits
    out(2L) shouldBe ((2L, 0L, 0.0, 0.0, 0.0, 0.0))
    out(3L) shouldBe ((3L, 0L, 0.0, 0.0, 0.0, 0.0))
    out(4L)._3 shouldBe 1.0 +- 1e-12  // all Latin incl. ï and é
  }

  test("lengthBucketBatches: buckets, per-shard batching and padded_len match a hand computation") {
    import spark.implicits._
    // one shard so batch order is globally deterministic; bounds 10/20
    // give buckets 0 (<=10), 1 (11..20), 2 (>20)
    val docs = Seq(
      (1L, 5L), (2L, 9L), (3L, 10L),          // bucket 0
      (4L, 11L), (5L, 15L), (6L, 20L),        // bucket 1
      (7L, 21L), (8L, 99L)                    // bucket 2
    ).toDF("doc_id", "len")
    val out = graft.operators.TextAnalysis.lengthBucketBatches(
        docs, "doc_id", "len", bounds = Seq(10L, 20L), batchSize = 2,
        numShards = 1)
      .select("doc_id", "bucket", "batch_id", "padded_len")
      .as[(Long, Int, Long, Long)].collect().map(r => r._1 -> r).toMap
    out(1L) shouldBe ((1L, 0, 0L, 9L))   // batch {5,9} pads to 9
    out(2L) shouldBe ((2L, 0, 0L, 9L))
    out(3L) shouldBe ((3L, 0, 1L, 10L))  // partial trailing batch
    out(4L) shouldBe ((4L, 1, 0L, 15L))
    out(5L) shouldBe ((5L, 1, 0L, 15L))
    out(6L) shouldBe ((6L, 1, 1L, 20L))
    out(7L) shouldBe ((7L, 2, 0L, 99L))
    out(8L) shouldBe ((8L, 2, 0L, 99L))
    // docs of near-equal length share a batch: waste is small per batch
    // (pad 9 for a 5 is the worst here), never padded to the bucket max
  }

  test("lengthBucketBatches: validation and explicit shard") {
    import spark.implicits._
    val docs = Seq((1L, 5L), (2L, 6L)).toDF("doc_id", "len")
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.lengthBucketBatches(
        docs, "doc_id", "len", bounds = Seq(20L, 10L), batchSize = 2)
    }
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.lengthBucketBatches(
        docs, "doc_id", "len", bounds = Seq(10L), batchSize = 0)
    }
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.lengthBucketBatches(
        docs.withColumn("bucket", org.apache.spark.sql.functions.lit(1)),
        "doc_id", "len", bounds = Seq(10L), batchSize = 2)
    }
    // explicit shard is honored verbatim (numShards only sizes the default)
    val out = graft.operators.TextAnalysis.lengthBucketBatches(
        docs, "doc_id", "len", bounds = Seq(10L), batchSize = 1,
        numShards = 1,
        shard = Some(org.apache.spark.sql.functions.col("doc_id") % 2))
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    out(1L) shouldBe 1L
    out(2L) shouldBe 0L
  }
}
