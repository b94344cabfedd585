package graft

import graft.functions.TextKernels
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select($"doc_id", $"text")

  test("exact dedup removes full duplicates") {
    val doubled = docs.unionByName(docs)
    Dedup.exact(doubled, Seq("doc_id", "text")).count() shouldBe docs.count()
    Dedup.exactByContent(doubled).count() shouldBe
      docs.select(lower(trim($"text"))).distinct().count()
  }

  test("minhash LSH recovers every planted exact duplicate with jaccard 1.0") {
    val planted = docs.filter($"doc_id" < 20).withColumn("doc_id", $"doc_id" + 1000000L)
    val pairs = Dedup.minhashLshPairs(docs.unionByName(planted), "doc_id", "text",
      numHashes = 64, bands = 16, shingleSize = 3, minJaccard = 0.8)
    val exactPairs = pairs
      .filter($"id_b" === $"id_a" + 1000000L && $"jaccard" === 1.0)
      .count()
    exactPairs shouldBe 20L
  }

  test("minhash LSH plan contains no cartesian product") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text")
    val physical = pairs.queryExecution.executedPlan.toString()
    physical.toLowerCase should not include "cartesian"
    physical.toLowerCase should not include "broadcastnestedloop"
  }

  test("simhash: identical docs collide; unrelated docs differ") {
    val withHash = Dedup.withSimhash(docs)
    val h = withHash.filter($"doc_id".isin(0L, 1L)).orderBy("doc_id")
      .select("simhash").as[Long].collect()
    h(0) should not be h(1)

    val dup = docs.filter($"doc_id" === 0L)
      .withColumn("doc_id", lit(7777L))
    val both = Dedup.withSimhash(docs.filter($"doc_id" === 0L).unionByName(dup))
      .select("simhash").as[Long].collect()
    both(0) shouldBe both(1)
  }

  test("simhash hamming distance is small for near-duplicates") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val hs = Dedup.withSimhash(df).orderBy("doc_id").select("simhash").as[Long].collect()
    TextKernels.hamming64(hs(0), hs(1)) should be <= 12
  }

  test("ngram Jaccard finds planted duplicates at threshold 0.9") {
    val planted = docs.filter($"doc_id" < 10).withColumn("doc_id", $"doc_id" + 1000000L)
    val pairs = Dedup.ngramJaccardPairs(docs.unionByName(planted), "doc_id", "text",
      n = 3, minJaccard = 0.9)
    pairs.filter($"id_b" === $"id_a" + 1000000L).count() shouldBe 10L
  }

  test("embedding near-dup finds planted identical vectors, no cartesian") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val planted = emb.filter($"vec_id" < 10).withColumn("vec_id", $"vec_id" + 1000000L)
    val pairs = Dedup.embeddingNearDupPairs(emb.unionByName(planted), "vec_id", "embedding",
      dim = 64, planeBits = 12, minCosine = 0.999)
    pairs.filter($"id_b" === $"id_a" + 1000000L).count() shouldBe 10L
    pairs.queryExecution.executedPlan.toString().toLowerCase should not include "cartesian"
  }
}
