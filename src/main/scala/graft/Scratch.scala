package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main (not part of the driver contract):
  * `runMain graft.Scratch <queryName> [explain]` — times three runs of one
  * registered query (run 1 ≈ cold, run 3 ≈ warm) and optionally prints the
  * formatted plan.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val name = args(0)
    val fn = SparkEntry.queries(name)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[scratch] run$i $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (args.length > 1 && args(1) == "explain") fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
