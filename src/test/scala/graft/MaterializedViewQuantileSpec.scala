package graft

import graft.functions.Aggregators.DdSketchQuantiles
import graft.sinks.{LakeTable, MaterializedView}
import org.apache.spark.sql.functions._

/** Incremental approx-quantile maintenance (`approxQuantileCols`):
  * the view's maintained DDSketch bucket HISTOGRAMS must equal a
  * from-scratch JVM sketch
  * ([[graft.functions.Aggregators.DdSketchQuantiles]]) of the base's
  * surviving rows EXACTLY (integer bucket counts, no tolerance), and the
  * served estimates must match the aggregator's within 1-ulp-scale
  * relative slack — `Math.pow` is a JIT intrinsic whose codegen'd and
  * interpreted call sites may legally differ in the last bit, so the
  * midpoint float is the one place exactness is not a sound contract.
  * Deletes retract bucket counts exactly (no exhaustion recompute), NULL
  * groups are one key, NaN/NULL values contribute nothing, and the state
  * coexists with min/max reserves + HLL sketches in one view (the r9
  * nested-HOF-projection trap territory).
  */
class MaterializedViewQuantileSpec extends SparkTestBase {
  import spark.implicits._

  private val Alpha = 0.01

  private def tmp(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("mvq").toString
    (s"$root/t", s"$root/v")
  }

  /** Reference estimates: fold the surviving values through the
    * one-shot aggregator. NaN for an empty histogram maps to None (the
    * view serves NULL there).
    */
  private def reference(values: Seq[Double],
      qs: Seq[Double]): Seq[Option[Double]] = {
    val agg = new DdSketchQuantiles(Alpha, qs)
    val got = agg.finish(values.foldLeft(agg.zero)(agg.reduce))
    got.map(v => if (v.isNaN) None else Some(v))
  }

  /** Served estimate vs reference: equal, NULL-for-NaN aligned, with
    * 1e-9 relative slack for the Math.pow last-bit variance. */
  private def assertEst(got: Seq[Option[Double]],
      want: Seq[Option[Double]]): Unit = {
    got.size shouldBe want.size
    got.zip(want).foreach {
      case (None, None) => ()
      case (Some(g), Some(w)) =>
        assert(math.abs(g - w) <=
          1e-9 * math.max(math.abs(g), math.abs(w)),
          s"estimate $g vs reference $w")
      case (g, w) => fail(s"estimate $g vs reference $w")
    }
  }

  /** The maintained histogram of one group, straight off the view's lake
    * table: (positive buckets, negative buckets, zeros) — NULL state
    * reads as empty. */
  private def histograms(mvRoot: String,
      c: String): Map[Option[String], (Map[Int, Long], Map[Int, Long], Long)] =
    LakeTable.read(spark, mvRoot)
      .select(col("grp"), col(s"__ddp_$c"), col(s"__ddn_$c"),
        col(s"__ddz_$c")).collect()
      .map { r =>
        def m(i: Int): Map[Int, Long] =
          if (r.isNullAt(i)) Map.empty
          else r.getMap[Int, Long](i).toMap
        Option(r.getString(0)) ->
          ((m(1), m(2), if (r.isNullAt(3)) 0L else r.getLong(3)))
      }.toMap

  /** The aggregator's canonical histogram of the same values. */
  private def refHistogram(values: Seq[Double])
      : (Map[Int, Long], Map[Int, Long], Long) = {
    val agg = new DdSketchQuantiles(Alpha, Seq(0.5))
    agg.canonical(values.foldLeft(agg.zero)(agg.reduce))
  }

  private def served(mvRoot: String, qs: Seq[Double],
      cols: Seq[String]): Map[String, Seq[Option[Double]]] =
    MaterializedView.read(spark, mvRoot, qs)
      .select(col("grp") +: cols.map(col): _*)
      .collect()
      .map(r => r.getString(0) -> cols.indices.map(i =>
        if (r.isNullAt(i + 1)) None else Some(r.getDouble(i + 1))).toSeq)
      .toMap

  test("insert + delete deliveries serve the from-scratch sketch exactly") {
    val (t, v) = tmp()
    val base = Seq(
      (1L, "a", 10.0), (2L, "a", 12.5), (3L, "a", 0.0), (4L, "a", -3.25),
      (5L, "b", 100.0), (6L, "b", 200.0), (7L, "b", 300.0),
      (8L, "b", 400.0), (9L, "b", 500.0)).toDF("id", "grp", "x")
    LakeTable.init(base, t, Seq("id"), numBuckets = 2)
    MaterializedView.init(spark, t, v, Seq("grp"), Seq("x"),
      numBuckets = 2, approxQuantileCols = Seq("x"), quantileAlpha = Alpha)
    // delivery 1: inserts (one churns an existing key's value)
    LakeTable.merge(spark, t, Seq(
      (2L, "a", 99.0), (10L, "b", 250.0), (11L, "a", 7.0))
      .toDF("id", "grp", "x"))
    MaterializedView.refresh(spark, t, v)
    // delivery 2: deletes, including a group's largest and the zero
    LakeTable.delete(spark, t, Seq(3L, 9L, 5L).toDF("id"))
    MaterializedView.refresh(spark, t, v)

    val qs = Seq(0.5, 0.95)
    val survivors = LakeTable.read(spark, t)
      .select($"grp", $"x").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).toSeq).toMap
    val got = served(v, qs, Seq("appx_p500_x", "appx_p950_x"))
    got.keySet shouldBe survivors.keySet
    val hists = histograms(v, "x")
    for ((g, vals) <- survivors) {
      assertEst(got(g), reference(vals, qs))
      // the histogram itself (integer counts) matches with NO tolerance —
      // this is the retraction-exactness claim
      hists(Some(g)) shouldBe refHistogram(vals)
    }
  }

  test("NULL group and NULL/NaN values: one key, no phantom buckets") {
    val (t, v) = tmp()
    val base = Seq(
      (1L, null.asInstanceOf[String], Some(5.0)),
      (2L, null.asInstanceOf[String], Some(Double.NaN)),
      (3L, "g", Option.empty[Double]),
      (4L, "g", Some(8.0))).toDF("id", "grp", "x")
    LakeTable.init(base, t, Seq("id"), numBuckets = 1)
    MaterializedView.init(spark, t, v, Seq("grp"), Seq("x"),
      numBuckets = 1, approxQuantileCols = Seq("x"), quantileAlpha = Alpha)
    // the NULL group gains a value and loses its NaN carrier; g loses
    // its only non-null value — histogram empties, estimate goes NULL
    LakeTable.merge(spark, t,
      Seq((5L, null.asInstanceOf[String], Some(6.0)))
        .toDF("id", "grp", "x"))
    LakeTable.delete(spark, t, Seq(2L, 4L).toDF("id"))
    MaterializedView.refresh(spark, t, v)

    val rows = MaterializedView.read(spark, v, Seq(0.5))
      .select($"grp", $"cnt", $"appx_p500_x").collect()
      .map(r => (Option(r.getString(0)),
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    rows.keySet shouldBe Set(None, Some("g"))
    rows(None)._1 shouldBe 2L
    assertEst(Seq(rows(None)._2), reference(Seq(5.0, 6.0), Seq(0.5)))
    // g still has a row (the all-NULL one) but an empty histogram
    rows(Some("g")) shouldBe ((1L, None))
    val hists = histograms(v, "x")
    hists(None) shouldBe refHistogram(Seq(5.0, 6.0))
    hists(Some("g")) shouldBe refHistogram(Nil)
  }

  test("coexists with min/max reserves + HLL through an exhaustion recompute") {
    val (t, v) = tmp()
    val base = (1L to 40L).map(i =>
      (i, s"g${i % 2}", i.toDouble, s"u${i % 7}"))
      .toDF("id", "grp", "x", "u")
    LakeTable.init(base, t, Seq("id"), numBuckets = 2)
    MaterializedView.init(spark, t, v, Seq("grp"), Seq("x"),
      numBuckets = 2, minMaxCols = Seq("x"), reserveDepth = 1,
      approxNdCols = Seq("u"), approxQuantileCols = Seq("x"),
      quantileAlpha = Alpha)
    // delete each group's minimum (wipes the depth-1 reserve → recompute)
    // plus a mid value; quantile state must pass through the patch intact
    LakeTable.delete(spark, t, Seq(1L, 2L, 21L).toDF("id"))
    MaterializedView.refresh(spark, t, v, reserveDepth = 1)
    assert(MaterializedView.lastExhausted > 0,
      "test meant to exercise the recompute patch")

    val qs = Seq(0.5)
    val survivors = LakeTable.read(spark, t)
      .select($"grp", $"x").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).toSeq).toMap
    val got = MaterializedView.read(spark, v, qs)
      .select($"grp", $"min_x", $"max_x", $"appx_p500_x").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    for ((g, vals) <- survivors) {
      got(g)._1 shouldBe vals.min
      got(g)._2 shouldBe vals.max
      assertEst(Seq(Some(got(g)._3)), reference(vals, qs))
    }
  }

  test("alpha survives the sync chain and vacuum; foreign alpha is refused") {
    val (t, v) = tmp()
    val base = Seq((1L, "a", 2.0), (2L, "a", 4.0)).toDF("id", "grp", "x")
    LakeTable.init(base, t, Seq("id"), numBuckets = 1)
    MaterializedView.init(spark, t, v, Seq("grp"), Seq("x"),
      numBuckets = 1, approxQuantileCols = Seq("x"), quantileAlpha = Alpha)
    for (i <- 3 to 6) {
      LakeTable.merge(spark, t,
        Seq((i.toLong, "a", i * 1.5)).toDF("id", "grp", "x"))
      MaterializedView.refresh(spark, t, v)
    }
    MaterializedView.vacuum(spark, v, keepLast = 2)
    // served estimates still resolve (alpha intact on the kept markers)
    val vals = LakeTable.read(spark, t)
      .select($"x").collect().map(_.getDouble(0)).toSeq
    val got = MaterializedView.read(spark, v, Seq(0.5))
      .select($"appx_p500_x").head().getDouble(0)
    assertEst(Seq(Some(got)), reference(vals, Seq(0.5)))
    // a view WITHOUT quantile state refuses the quantile read
    val (t2, v2) = tmp()
    LakeTable.init(base, t2, Seq("id"), numBuckets = 1)
    MaterializedView.init(spark, t2, v2, Seq("grp"), Seq("x"),
      numBuckets = 1)
    intercept[IllegalArgumentException] {
      MaterializedView.read(spark, v2, Seq(0.5)).collect()
    }
  }
}
