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
}
