package graft

import graft.operators.Layout
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("morton interleave matches a reference bit-interleave") {
    def ref(x: Long, y: Long, bits: Int): Long = {
      var z = 0L
      for (b <- 0 until bits) {
        z |= ((x >> b) & 1L) << (2 * b)
        z |= ((y >> b) & 1L) << (2 * b + 1)
      }
      z
    }
    val pts = Seq((3L, 5L), (255L, 0L), (0L, 255L), (170L, 85L))
    val got = pts.toDF("x", "y")
      .select(Layout.mortonInterleave(Seq($"x", $"y"), 8).alias("z"))
      .as[Long].collect().toSeq
    got shouldBe pts.map { case (x, y) => ref(x, y, 8) }
  }

  test("z-order tiles are compact boxes; multi-dim box queries touch few files") {
    val grid = spark.range(65536).select(
      (col("id") % 256).alias("x"),
      shiftright(col("id"), 8).alias("y"),
      col("id").alias("v"))
    val path = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.zorderWrite(grid, Seq("x", "y"), path, bits = 8, tileBits = 4)
    val back = spark.read.parquet(path)
    back.count() shouldBe 65536L

    // 16 tile files, each a full 64×64 box: tight envelopes in BOTH dims
    val env = Layout.fileEnvelopes(back, Seq("x", "y")).collect()
    env.length shouldBe 16
    env.foreach { r =>
      r.getAs[Long]("n_rows") shouldBe 4096L
      (r.getAs[Long]("max_x") - r.getAs[Long]("min_x")) shouldBe 63L
      (r.getAs[Long]("max_y") - r.getAs[Long]("min_y")) shouldBe 63L
    }

    def filesTouched(df: DataFrame, cond: Column): Long =
      df.filter(cond).select(input_file_name()).distinct().count()
    // a quarter box lives in exactly ONE z-order tile; a one-dim band in 4
    filesTouched(back, $"x" < 64 && $"y" < 64) shouldBe 1L
    filesTouched(back, $"y" < 64) shouldBe 4L

    // the same data laid out linearly by x alone: the quarter box smears
    // over 4 files and the y band over ALL 16 — nothing prunes on y
    val linPath = java.nio.file.Files.createTempDirectory("linear").toString
    grid.withColumn("__tile", shiftright($"x", 4))
      .repartition(col("__tile"))
      .sortWithinPartitions($"__tile", $"x")
      .write.mode("overwrite").partitionBy("__tile").parquet(linPath)
    val lin = spark.read.parquet(linPath)
    filesTouched(lin, $"x" < 64 && $"y" < 64) shouldBe 4L
    filesTouched(lin, $"y" < 64) shouldBe 16L
  }

  test("withZOrder scales arbitrary ranges into bucket space; constant column degrades gracefully") {
    val df = Seq((-100.0, 1000L), (0.0, 2000L), (100.0, 3000L)).toDF("a", "b")
    // bits=2, top=3: a ∈ {-100,0,100} → {0,1,3}; b ∈ {1000,2000,3000} → {0,1,3}
    // interleave (a even bits, b odd bits): (0,0)→0, (1,1)→3, (3,3)→15
    Layout.withZOrder(df, Seq("a", "b"), bits = 2)
      .select("__z").as[Long].collect().sorted.toSeq shouldBe Seq(0L, 3L, 15L)

    val const = Layout.withZOrder(Seq((1, 1), (1, 16)).toDF("k", "m"), Seq("k", "m"), bits = 4)
    // k is constant → bucket 0 contributes nothing; m spans {1,16} → {0,15},
    // and 15's bits land on the odd z positions: 2 + 8 + 32 + 128 = 170
    const.select("__z").as[Long].collect().sorted.toSeq shouldBe Seq(0L, 170L)
  }
}
