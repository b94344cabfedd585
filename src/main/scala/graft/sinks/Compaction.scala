package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-files compaction for parquet lake datasets — the daily-operational
  * concern every partitioned 100 TB lake has: streaming/batch appends leave
  * thousands of KB-sized files per partition, and scan planning + footer
  * reads start to dominate query time.
  *
  * `compact` sizes the output from the actual input bytes (ceil(size /
  * targetFileBytes) files), optionally range-clusters rows by sort columns
  * (so min/max footer stats prune downstream scans), and publishes
  * atomically: write to a staging dir with the normal committer, then one
  * filesystem rename — readers see the old fileset or the new one, never a
  * mix.
  */
object Compaction {

  final case class CompactionResult(filesBefore: Int, filesAfter: Int,
      bytes: Long, rows: Long)

  private def parquetFiles(spark: SparkSession, dir: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).toSeq.filter(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
  }

  /** Compact one dataset/partition directory in place. */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      sortCols: Seq[String] = Nil): CompactionResult = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    val before = parquetFiles(spark, dirPath)
    val bytes  = before.map(_.getLen).sum
    val nOut   = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)

    val df   = spark.read.parquet(dir)
    val rows = df.count()
    val shaped =
      if (sortCols.nonEmpty) df.repartitionByRange(nOut, sortCols.map(col): _*)
      else df.repartition(nOut)

    // LakeSink's stage-and-swap: staging is cleaned up on ANY failure (no
    // orphaned .compact-* dirs from repeated failing runs), the live dir is
    // moved aside—not deleted—before publish, and restored if publish fails.
    LakeSink.stageAndSwap(fs, dirPath) { staging =>
      shaped.write.mode("overwrite").parquet(staging.toString)
    }

    CompactionResult(before.size, parquetFiles(spark, dirPath).size, bytes, rows)
  }
}
