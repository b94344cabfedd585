package graft

import graft.operators.{InvertedIndex, TextAnalysis}

class InvertedIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark shuffle hash join shuffle"),
    (2L, "hash partition hash"),
    (3L, "no relevant terms here"),
    (4L, "shuffle shuffle shuffle partition"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("bm25 served from the index equals the direct recompute, score for score") {
    val path = java.nio.file.Files.createTempDirectory("invidx").toString
    InvertedIndex.build(docs, "doc_id", "text", path, numPartitions = 2)
    val terms = Seq("shuffle", "hash", "partition")
    val served = InvertedIndex.bm25(spark, path, terms)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val direct = TextAnalysis.bm25Scores(docs, "doc_id", terms)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    served.keySet shouldBe direct.keySet
    served.keySet shouldBe Set(1L, 2L, 4L) // only docs with >= 1 query term
    for ((id, (nh, s)) <- direct) {
      served(id)._1 shouldBe nh
      served(id)._2 shouldBe s +- 1e-12
    }
  }

  test("index layout: postings prune to queried terms; termstats df is exact") {
    val path = java.nio.file.Files.createTempDirectory("invidx2").toString
    InvertedIndex.build(docs, "doc_id", "text", path, numPartitions = 2)
    val postings = spark.read.parquet(s"$path/postings")
    // tf aggregated per (term, doc): "shuffle" in doc 4 appears 3 times
    postings.where($"term" === "shuffle" && $"doc_id" === 4L)
      .select("tf").as[Long].head() shouldBe 3L
    val df = spark.read.parquet(s"$path/termstats")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    df("shuffle") shouldBe 2L // docs 1 and 4
    df("hash") shouldBe 2L    // docs 1 and 2
    df("partition") shouldBe 2L
    // stats row: n counts ALL docs (including zero-hit and empty)
    val stats = spark.read.parquet(s"$path/stats").collect().head
    stats.getLong(0) shouldBe 5L
  }

  test("rebuild is atomic: a second build over changed docs fully replaces") {
    val path = java.nio.file.Files.createTempDirectory("invidx3").toString
    InvertedIndex.build(docs, "doc_id", "text", path, numPartitions = 2)
    val more = docs.union(Seq((6L, "shuffle")).toDF("doc_id", "text"))
    InvertedIndex.build(more, "doc_id", "text", path, numPartitions = 2)
    val df = spark.read.parquet(s"$path/termstats")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    df("shuffle") shouldBe 3L
    spark.read.parquet(s"$path/stats").collect().head.getLong(0) shouldBe 6L
  }

  private val delta = Seq(
    (6L, "shuffle partition spark"),
    (7L, "hash hash hash shuffle")
  ).toDF("doc_id", "text")

  private def servedMap(path: String): Map[Long, (Long, Double)] =
    InvertedIndex.bm25(spark, path, Seq("shuffle", "hash", "partition"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("append serves scores identical to a from-scratch build over the union") {
    val inc  = java.nio.file.Files.createTempDirectory("invidx_inc").toString
    val full = java.nio.file.Files.createTempDirectory("invidx_full").toString
    InvertedIndex.build(docs, "doc_id", "text", inc, numPartitions = 2)
    InvertedIndex.append(delta, "doc_id", "text", inc, numPartitions = 2)
    InvertedIndex.build(docs.union(delta), "doc_id", "text", full, numPartitions = 2)
    val (i, f) = (servedMap(inc), servedMap(full))
    i.keySet shouldBe f.keySet
    for ((id, (nh, s)) <- f) {
      i(id)._1 shouldBe nh
      i(id)._2 shouldBe s +- 1e-12 // avgdl/df partials merge to exact longs
    }
    // re-appending the SAME delta is a no-op delivery (anti-join on doclen)
    InvertedIndex.append(delta, "doc_id", "text", inc, numPartitions = 2)
    servedMap(inc) shouldBe i
    spark.read.parquet(s"$inc/doclen").count() shouldBe 7L
  }

  test("unmarked (crash-orphan) delivery is invisible; retry heals in place") {
    val path = java.nio.file.Files.createTempDirectory("invidx_crash").toString
    InvertedIndex.build(docs, "doc_id", "text", path, numPartitions = 2)
    val before = servedMap(path)
    // simulate a crash AFTER the postings landed but BEFORE the marker:
    // plant an orphan delivery=1 postings dir with a poisoned row
    Seq(("shuffle", 99L, 1000L)).toDF("term", "doc_id", "tf")
      .write.parquet(s"$path/postings/delivery=1")
    servedMap(path) shouldBe before // marker filter prunes the orphan
    // the retry reuses id 1 and REPLACES the orphan via stage-and-swap
    InvertedIndex.append(delta, "doc_id", "text", path, numPartitions = 2)
    val after = servedMap(path)
    after.keySet shouldBe Set(1L, 2L, 4L, 6L, 7L)
    after should not contain key(99L)
  }

  test("compact folds deliveries to one; served results byte-identical") {
    val path = java.nio.file.Files.createTempDirectory("invidx_compact").toString
    InvertedIndex.build(docs, "doc_id", "text", path, numPartitions = 2)
    InvertedIndex.append(delta, "doc_id", "text", path, numPartitions = 2)
    InvertedIndex.append(Seq((8L, "partition")).toDF("doc_id", "text"),
      "doc_id", "text", path, numPartitions = 2)
    val before = servedMap(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    InvertedIndex.deliveries(fs, path) shouldBe Seq(0, 1, 2)
    InvertedIndex.compact(spark, path, numPartitions = 2)
    InvertedIndex.deliveries(fs, path) shouldBe Seq(0)
    // every table folded to a single delivery directory
    for (t <- Seq("postings", "termstats", "doclen", "stats"))
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/$t")).toSeq
        .map(_.getPath.getName).filter(_.startsWith("delivery="))
        .shouldBe(Seq("delivery=0"))
    servedMap(path) shouldBe before // bit-identical: exact-long partials
    // and the compacted index still accepts appends
    InvertedIndex.append(Seq((9L, "hash")).toDF("doc_id", "text"),
      "doc_id", "text", path, numPartitions = 2)
    servedMap(path)(9L)._1 shouldBe 1L
  }

  test("positional index: phrase counts exact, repeated terms, appends inherit, survives compact") {
    val path = java.nio.file.Files.createTempDirectory("invidx_pos").toString
    val planted = Seq(
      (1L, "x alpha beta alpha beta y"), // "alpha beta" twice
      (2L, "beta alpha"),                // reversed — no match
      (3L, "alpha alpha alpha"),         // "alpha alpha" twice (overlapping)
      (4L, "alpha beta")                 // once, at the edges
    ).toDF("doc_id", "text")
    InvertedIndex.build(planted, "doc_id", "text", path,
      numPartitions = 2, positional = true)

    def counts(phrase: Seq[String]): Map[Long, Long] =
      InvertedIndex.phraseCount(spark, path, phrase)
        .as[(Long, Long)].collect().toMap
    counts(Seq("alpha", "beta")) shouldBe Map(1L -> 2L, 4L -> 1L)
    counts(Seq("alpha", "alpha")) shouldBe Map(3L -> 2L)
    counts(Seq("x", "alpha", "beta")) shouldBe Map(1L -> 1L) // trigram
    counts(Seq("nosuch", "beta")) shouldBe Map.empty

    // an appended delivery inherits positional-ness and is searchable
    InvertedIndex.append(Seq((9L, "alpha beta gamma")).toDF("doc_id", "text"),
      "doc_id", "text", path, numPartitions = 2)
    counts(Seq("alpha", "beta", "gamma")) shouldBe Map(9L -> 1L)
    // compaction folds deliveries without losing positions
    InvertedIndex.compact(spark, path, numPartitions = 2)
    counts(Seq("alpha", "beta")) shouldBe Map(1L -> 2L, 4L -> 1L, 9L -> 1L)
    // bm25 probes the same positional index unchanged (pos column pruned)
    InvertedIndex.bm25(spark, path, Seq("alpha")).count() shouldBe 5L

    // a non-positional index refuses phrase queries loudly
    val bare = java.nio.file.Files.createTempDirectory("invidx_bare").toString
    InvertedIndex.build(planted, "doc_id", "text", bare, numPartitions = 2)
    an[IllegalArgumentException] should be thrownBy
      InvertedIndex.phraseCount(spark, bare, Seq("alpha", "beta")).collect()
  }

  test("proximity NEAR/w: window edges inclusive, either order, per-occurrence counts") {
    val path = java.nio.file.Files.createTempDirectory("invidx_near").toString
    val planted = Seq(
      (1L, "a x x b"),       // |0-3| = 3: inside NEAR/3
      (2L, "a x x x b"),     // |0-4| = 4: outside
      (3L, "b a"),           // reversed order still matches
      (4L, "a x b x a x x x x x a") // a@0 (b@2 ok), a@4 (|4-2|=2 ok), a@10 (no)
    ).toDF("doc_id", "text")
    InvertedIndex.build(planted, "doc_id", "text", path,
      numPartitions = 2, positional = true)
    val out = InvertedIndex.proximityCount(spark, path, "a", "b", 3)
      .as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 1L, 3L -> 1L, 4L -> 2L)
  }
}
