package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table writer — the co-located-join layout for joins that repeat
  * at 100 TB. Writing both sides of a hot join `bucketBy(n, key)` (and
  * `sortBy(key)`) lets every subsequent equi-join on the key run as a
  * sort-merge join with ZERO shuffle exchanges: each bucket pair joins
  * in place, and the in-file sort order even removes the sort step.
  * This trades one up-front clustered write for every downstream join's
  * shuffle — the standard warehouse layout for fact⋈fact joins that AQE
  * can't broadcast.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted datasource table (parquet). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      numBuckets: Int, keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
