package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness (not part of the driver contract). */
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
    if (sys.env.contains("SCRATCH_NO_CODEGEN"))
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val fn = SparkEntry.queries(name)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[scratch] run$i $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (args.length > 1 && args(1) == "explain") fn(spark, sfDir).explain("formatted")
    if (args.length > 1 && args(1) == "parts") {
      import org.apache.spark.sql.functions._
      import graft.functions.TextFunctions
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val all = docs.unionByName(planted)
      def time(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"[scratch] $label rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      val toks = all.select(col("doc_id"), TextFunctions.tokens(col("text")).alias("t"))
      time("tokens")(toks.agg(sum(size(col("t")))).count())
      val sh = all.select(col("doc_id"),
        TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).alias("sh"))
      time("shingles")(sh.agg(sum(size(col("sh")))).count())
      val hsh = all.select(col("doc_id"),
        array_distinct(transform(
          TextFunctions.shingles(TextFunctions.tokens(col("text")), 3),
          s => hash(s))).alias("sh"))
      time("hashedShingles")(hsh.agg(sum(size(col("sh")))).count())
      val blocked = hsh.select(col("doc_id"), array_min(col("sh")).alias("m"))
      time("blocked")(blocked.count())
      val cand = blocked.alias("a").join(blocked.alias("b"), Seq("m"))
        .select(col("a.doc_id").alias("id_a"), col("b.doc_id").alias("id_b"))
        .filter(col("id_a") < col("id_b")).dropDuplicates("id_a", "id_b")
      time("m-forced")(blocked.agg(sum(col("m"))).count())
      val joined = blocked.alias("a").join(blocked.alias("b"), Seq("m"))
      time("join-only")(joined.count())
      val proj = joined.select(col("a.doc_id").alias("id_a"), col("b.doc_id").alias("id_b"))
        .filter(col("id_a") < col("id_b"))
      time("join-proj-filter")(proj.count())
      time("candidates-full")(cand.count())
    }
    spark.stop()
  }
}
