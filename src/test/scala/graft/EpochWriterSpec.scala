package graft

import graft.operators.Splits
import graft.sinks.EpochWriter
import org.apache.spark.sql.functions._

class EpochWriterSpec extends SparkTestBase {
  import spark.implicits._

  test("epoch export: permutation preserved, bins budgeted, epoch order reconstructable") {
    val docs = spark.range(500).select($"id".alias("doc_id"),
      (($"id" % 37) + 5).alias("toks"))
    val out = java.nio.file.Files.createTempDirectory("graft_epoch").toString
    val rep = EpochWriter.writeEpoch(docs, "doc_id", "toks", out,
      budget = 100, numShards = 4, seed = 1)
    rep.rows shouldBe 500L
    rep.shards shouldBe 4L
    rep.bins should be >= 4L
    rep.files should be >= 4L

    val back = spark.read.parquet(out).withColumn("shard", $"shard".cast("long"))
    // (shard, bin_id, pos) ascending IS the epoch order — it must equal the
    // deterministic shuffle's order exactly
    val epochIds = back.orderBy($"shard", $"bin_id", $"pos")
      .select($"doc_id").as[Long].collect()
    val shufIds = Splits.deterministicShuffle(docs, "doc_id", seed = 1)
      .orderBy($"pos").select($"doc_id").as[Long].collect()
    epochIds shouldBe shufIds
    epochIds.sorted shouldBe (0L until 500L).toArray // a true permutation

    // every bin within budget + its straddling last doc
    back.groupBy($"shard", $"bin_id")
      .agg(sum($"toks").alias("s"), max($"toks").alias("m"))
      .filter($"s" > lit(100) + $"m").count() shouldBe 0L

    // a second epoch (different seed) reorders the same ids
    val out2 = java.nio.file.Files.createTempDirectory("graft_epoch2").toString
    EpochWriter.writeEpoch(docs, "doc_id", "toks", out2,
      budget = 100, numShards = 4, seed = 2)
    val epoch2Ids = spark.read.parquet(out2)
      .withColumn("shard", $"shard".cast("long"))
      .orderBy($"shard", $"bin_id", $"pos").select($"doc_id").as[Long].collect()
    epoch2Ids.sorted shouldBe epochIds.sorted
    epoch2Ids should not equal epochIds
  }
}
