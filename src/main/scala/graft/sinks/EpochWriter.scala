package graft.sinks

import graft.operators.{Splits, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Training-epoch export — the last mile of a corpus pipeline: produce the
  * files a trainer streams, in a reproducible pseudo-random order, packed
  * to a token budget.
  *
  * ```
  * docs → deterministic shuffle (md5-keyed, seeded)
  *      → contiguous position-block shards (shard boundaries respect the
  *        shuffled order, so (shard, bin_id, pos) ascending IS epoch order)
  *      → token-budget packing within each shard
  *      → parquet partitioned by shard, rows sorted by pos within files
  * ```
  *
  * Scale posture: the shuffle is a range-partitioned sort + two-pass
  * position assignment (no single-task stage); packing windows partition
  * by shard; the write repartitions on shard once and sorts within
  * partitions — every stage is shard-parallel. One epoch differs from the
  * next only by `seed`.
  */
object EpochWriter {

  final case class EpochReport(rows: Long, shards: Long, bins: Long, files: Long)

  /** Write one epoch of `docs` to `outDir` (overwrites). `tokenCol` is the
    * per-doc token count used for packing; a bin may exceed `budget` by at
    * most its final (straddling) document, which stays whole.
    */
  def writeEpoch(docs: DataFrame, idCol: String, tokenCol: String, outDir: String,
      budget: Long, numShards: Int = 64, seed: Int = 42): EpochReport = {
    require(numShards > 0, "numShards must be positive")
    // Row count for the block size comes from the SOURCE (a columnar
    // metadata-only count — no text materialized), not from caching the
    // shuffled frame: a MEMORY_AND_DISK persist of the full corpus text per
    // epoch was pure allocation churn (deterministicShuffle already reuses
    // its sort's shuffle files across the position-count job and the write
    // job, so nothing below recomputes the heavy sort).
    val n = docs.count()
    val shuffled = Splits.deterministicShuffle(docs, idCol, seed)
    // contiguous position blocks: shard is monotone in pos, so epoch
    // order is exactly (shard, bin_id, pos) ascending across files
    val block = math.max(1L, (n + numShards - 1) / numShards)
    val packed = TextAnalysis.packSequences(shuffled, "pos", tokenCol, budget,
      numShards, shard = Some(col("pos").divide(block).cast("long")))
    packed
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(outDir)
    val back = docs.sparkSession.read.parquet(outDir)
    val stats = back.agg(
      count(lit(1)).alias("rows"),
      countDistinct(col("shard")).alias("shards"),
      countDistinct(col("shard"), col("bin_id")).alias("bins")).head()
    val files = {
      val path = new org.apache.hadoop.fs.Path(outDir)
      val fs = path.getFileSystem(
        docs.sparkSession.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(path, true)
      var c = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) c += 1
      }
      c
    }
    EpochReport(stats.getLong(0), stats.getLong(1), stats.getLong(2), files)
  }
}
