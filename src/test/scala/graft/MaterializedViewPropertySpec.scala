package graft

import graft.sinks.{LakeTable, MaterializedView}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property sweep over the materialized view's FULL aggregate surface —
  * count, exact decimal sum, k-deep-reserve min/max, HLL approx-distinct,
  * DDSketch approx-quantiles, and sample variance — under random delivery
  * sequences
  * (upserts with value churn, deletes, NULLs in both the min/max and the
  * distinct column). After every sequence the maintained view must equal
  * the from-scratch aggregate of the base's final content: the reserve
  * algebra (subtraction, prefix-safe insert merge, exhaustion recompute)
  * and the sketch union/retraction routing have no delivery pattern they
  * are allowed to disagree on. Cardinalities stay inside DataSketches'
  * exact LIST/SET range, so the "approx" distinct column is
  * value-comparable; the quantile estimate compares EXACTLY against a
  * from-scratch JVM sketch of the survivors (same bucket arithmetic, two
  * independent implementations).
  */
class MaterializedViewPropertySpec extends SparkTestBase {
  import spark.implicits._

  private type Row4 = (Long, String, Option[Double], String)

  private val genRow: Gen[Row4] = for {
    id <- Gen.choose(1L, 14L)
    // NULL is a legal group value (GROUP BY groups it): the full-outer
    // merge, the lookup, the exhaustion recompute, and the view table's
    // keyed upsert/delete must all treat the NULL group as ONE key
    grp <- Gen.frequency(
      6 -> Gen.oneOf("g0", "g1", "g2"),
      1 -> Gen.const(null.asInstanceOf[String]))
    score <- Gen.frequency(
      5 -> Gen.choose(0, 19).map(v => Some(v.toDouble)),
      1 -> Gen.const(Option.empty[Double]))
    user <- Gen.frequency(
      8 -> Gen.oneOf("u0", "u1", "u2", "u3", "u4", "u5"),
      1 -> Gen.const(null.asInstanceOf[String]))
  } yield (id, grp, score, user)

  private val genRows: Gen[Seq[Row4]] =
    Gen.nonEmptyListOf(genRow).map(_.distinctBy(_._1))

  private val genDeletes: Gen[Seq[Long]] =
    Gen.listOf(Gen.choose(1L, 14L)).map(_.distinct)

  private def df(rows: Seq[Row4]) = rows.toDF("id", "grp", "score", "user")

  /** (cnt, sum, min, max, nd) per group. NULL min/max (all-NULL group)
    * folds to a finite sentinel — NOT NaN, whose `!=`-to-itself would
    * fail map equality on two CORRECT sides.
    */
  private val NullMm = -1e18
  private def snapshot(d: org.apache.spark.sql.DataFrame)
      : Map[String, (Long, BigDecimal, Double, Double, Long)] =
    d.collect().map { r =>
      r.getString(0) -> ((r.getLong(1),
        BigDecimal(r.getDecimal(2)),
        if (r.isNullAt(3)) NullMm else r.getDouble(3),
        if (r.isNullAt(4)) NullMm else r.getDouble(4),
        r.getLong(5)))
    }.toMap

  test("property: view == from-scratch aggregate after any delivery sequence") {
    val prop = Prop.forAll(genRows, genRows, genDeletes, genRows, genDeletes) {
      (base, up1, del1, up2, del2) =>
        val root = java.nio.file.Files.createTempDirectory("mvprop").toString
        val tableRoot = s"$root/t"; val mvRoot = s"$root/v"
        LakeTable.init(df(base), tableRoot, Seq("id"), numBuckets = 2)
        MaterializedView.init(spark, tableRoot, mvRoot, Seq("grp"),
          Seq("score"), numBuckets = 2, minMaxCols = Seq("score"),
          reserveDepth = 2, approxNdCols = Seq("user"),
          approxQuantileCols = Seq("score"), quantileAlpha = 0.01,
          varCols = Seq("score"))
        Seq((up1, del1), (up2, del2)).foreach { case (ups, dels) =>
          if (ups.nonEmpty) LakeTable.merge(spark, tableRoot, df(ups))
          if (dels.nonEmpty)
            LakeTable.delete(spark, tableRoot, dels.toDF("id"))
          MaterializedView.refresh(spark, tableRoot, mvRoot,
            reserveDepth = 2)
        }
        val got = snapshot(MaterializedView.read(spark, mvRoot)
          .select($"grp", $"cnt", $"sum_score", $"min_score", $"max_score",
            $"appx_nd_user"))
        val want = snapshot(LakeTable.read(spark, tableRoot)
          .groupBy($"grp")
          .agg(count(lit(1)).alias("cnt"),
            // the view serves COALESCE(SUM(x), 0) — see MaterializedView.read
            coalesce(sum($"score".cast("decimal(38,6)")),
              lit(0).cast("decimal(38,6)")).cast("decimal(38,6)").alias("s"),
            min($"score").alias("mn"), max($"score").alias("mx"),
            count_distinct($"user").alias("nd")))
        // quantile leg, two tiers: the maintained bucket HISTOGRAM must
        // equal a from-scratch JVM sketch of the survivors EXACTLY
        // (integer counts — the retraction-exactness claim), and the
        // served estimate must match the aggregator's within 1e-9
        // relative (Math.pow is a JIT intrinsic: codegen'd vs interpreted
        // call sites of the same midpoint formula may differ in the last
        // bit, so float exactness is not a sound contract there)
        val gotQ = MaterializedView.read(spark, mvRoot, Seq(0.5))
          .select($"grp", $"appx_p500_score").collect()
          .map(r => Option(r.getString(0)) ->
            (if (r.isNullAt(1)) NullMm else r.getDouble(1))).toMap
        val gotH = LakeTable.read(spark, mvRoot)
          .select($"grp", $"__ddp_score", $"__ddz_score").collect()
          .map { r =>
            Option(r.getString(0)) -> ((
              if (r.isNullAt(1)) Map.empty[Int, Long]
              else r.getMap[Int, Long](1).toMap,
              if (r.isNullAt(2)) 0L else r.getLong(2)))
          }.toMap
        val survQ = LakeTable.read(spark, tableRoot)
          .select($"grp", $"score").collect()
          .groupBy(r => Option(r.getString(0))).view.mapValues(
            _.filterNot(_.isNullAt(1)).map(_.getDouble(1)).toSeq).toMap
        val agg = new graft.functions.Aggregators.DdSketchQuantiles(
          0.01, Seq(0.5))
        val wantQ = survQ.view.mapValues { vals =>
          val q = agg.finish(vals.foldLeft(agg.zero)(agg.reduce)).head
          if (q.isNaN) NullMm else q
        }.toMap
        val wantH = survQ.view.mapValues { vals =>
          val (pos, _, zeros) =
            agg.canonical(vals.foldLeft(agg.zero)(agg.reduce))
          (pos, zeros)
        }.toMap
        val qOk = gotQ.keySet == wantQ.keySet && gotQ.keySet.forall { g =>
          val (a, b) = (gotQ(g), wantQ(g))
          a == b || math.abs(a - b) <=
            1e-9 * math.max(math.abs(a), math.abs(b))
        }
        // variance leg: the served sample variance must match var_samp of
        // the survivors within 1e-9 relative (the maintained Σx²/n state
        // is exact; the final divide runs in double, and Spark's
        // reference uses a different summation order). Spark reports NaN
        // below two values where the view serves NULL (SQL var_samp) —
        // normalize the want side.
        val gotV = MaterializedView.read(spark, mvRoot)
          .select($"grp", $"var_score").collect()
          .map(r => Option(r.getString(0)) ->
            (if (r.isNullAt(1)) NullMm else r.getDouble(1))).toMap
        val wantV = LakeTable.read(spark, tableRoot)
          .groupBy($"grp")
          .agg(var_samp($"score").alias("v")).collect()
          .map(r => Option(r.getString(0)) ->
            (if (r.isNullAt(1) || r.getDouble(1).isNaN) NullMm
             else r.getDouble(1))).toMap
        val vOk = gotV.keySet == wantV.keySet && gotV.keySet.forall { g =>
          val (a, b) = (gotV(g), wantV(g))
          a == b || math.abs(a - b) <=
            1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
        }
        val ok = got == want && qOk && gotH == wantH && vOk
        if (!ok) System.err.println(
          s"MV property mismatch:\n got $got\nwant $want\n" +
            s" gotQ $gotQ\nwantQ $wantQ\n gotH $gotH\nwantH $wantH\n" +
            s" gotV $gotV\nwantV $wantV\n" +
            s"base=$base\nup1=$up1 del1=$del1\nup2=$up2 del2=$del2")
        ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
