package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Compressed JSONL corpus interchange — the de-facto wire format for
  * LLM training corpora (one JSON object per document, shard files a
  * downstream loader can stream-decompress independently).
  *
  * Discipline over convenience:
  *  - READS REQUIRE A SCHEMA. Schema inference scans the whole dataset
  *    before the first real job — a full extra pass at 100 TB — and infers
  *    from whichever fields happen to be present (JSONL omits null fields,
  *    so inference can silently lose columns). Callers pass the contract
  *    schema; absent fields come back as proper nulls.
  *  - Shard count is explicit (`shards` > 0 round-robin repartitions) so
  *    file sizing is a deliberate choice, not whatever the upstream
  *    partitioning left behind. Text codecs aren't block-splittable, so
  *    sharding IS the parallelism unit — each file decompresses
  *    independently.
  *  - Codec defaults to gzip (available everywhere); pass "zstd" on
  *    clusters with the native Hadoop zstd codec loaded — this
  *    environment's Spark build lacks it.
  */
object CorpusJsonl {

  /** Write `df` as compressed JSONL under `path` (overwrite). `shards` > 0
    * fixes the output file count.
    */
  def write(df: DataFrame, path: String, shards: Int = 0,
      codec: String = "gzip"): Unit = {
    require(shards >= 0, s"shards must be >= 0, got $shards")
    val out = if (shards > 0) df.repartition(shards) else df
    out.write.mode("overwrite")
      .option("compression", codec)
      .json(path)
  }

  /** Read a JSONL corpus with an enforced schema. Malformed lines fail
    * loudly (FAILFAST) — a corpus loader that silently nulls a corrupt
    * shard poisons training data downstream.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)
}
