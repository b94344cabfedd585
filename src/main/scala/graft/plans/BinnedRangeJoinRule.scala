package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite an inner join whose ONLY cross-side predicates
  * form a point-in-interval range (`p >= lo AND p <= hi`, point from one
  * side, bounds from the other) into the binned equi-join that
  * [[graft.operators.RangeJoin.pointInInterval]] builds by hand:
  *
  * {{{
  *   points JOIN intervals ON p BETWEEN lo AND hi          -- BNLJ, O(n·m)
  * =>
  *   Project(points + __bin = floor(p/w))
  *     JOIN Generate(explode(sequence(floor(lo/w), floor(hi/w))), intervals)
  *     ON __bin = __bin_iv AND p BETWEEN lo AND hi          -- hash join
  * }}}
  *
  * Each (point, interval) pair meets in exactly one bin — the point's — so
  * the rewrite is exactly result-preserving (nulls: a null point bins to a
  * null key and never matches; a null bound makes `sequence` null and the
  * Generate emits nothing — both match the predicate's behavior).
  *
  * Bin width comes from `SET spark.graft.rangejoin.binwidth=<numeric>`
  * (pick it near the typical interval width), or — when the conf is unset
  * and CBO column statistics exist on the interval bounds (ANALYZE TABLE …
  * FOR COLUMNS, `spark.sql.cbo.enabled=true`) — it is DERIVED as
  * `(max(hi) − min(lo)) / rowCount`: the average domain share per interval,
  * i.e. ~rowCount bins over the span, which keeps both the per-interval
  * explode factor and the per-bin population near 1 for
  * partition-the-domain interval sets. Because a SINGLE outlier interval
  * spanning the whole domain would then explode into ~rowCount sequence
  * elements in Generate, the derived bin count is clamped at
  * `SET spark.graft.rangejoin.maxbins=<n>` (default 4096): the effective
  * width is `span / min(rowCount, maxbins)`, so no interval can generate
  * more than maxbins+1 rows regardless of table size. (An explicit conf
  * width is taken as-is — the user chose it knowing their intervals.)
  * Joins that already have an equi-predicate are left alone (they
  * hash-join fine without help), and with neither conf nor stats the join
  * is untouched.
  */
case class BinnedRangeJoinRule() extends Rule[LogicalPlan] {

  private val confKey    = "spark.graft.rangejoin.binwidth"
  private val maxBinsKey = "spark.graft.rangejoin.maxbins"

  private case class RangeMatch(point: Expression, lo: Expression, hi: Expression,
      pointOnLeft: Boolean)

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other     => Seq(other)
  }

  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  /** Find a lower and an upper bound on the same point expression with the
    * bounds on the opposite side. Every comparison is normalized in BOTH
    * orientations (`p >= lo` ≡ `lo <= p`; `p <= hi` ≡ `hi >= p`), so the
    * spelling order doesn't decide whether the rewrite fires. The bounds
    * stay in the residual predicate, so strict variants are exact too (the
    * bin join only over-generates candidates).
    */
  private def findRange(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[RangeMatch] = {
    // normalized (point, bound, isLower): both operand orders emitted
    val bounds = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
      case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
      case _                        => Seq.empty
    }.flatMap { case (a, b, isLower) =>
      (sideOf(a, left, right), sideOf(b, left, right)) match {
        case (Some(sa), Some(sb)) if sa != sb =>
          // orient as (point, bound, pointSideIsLeft, boundKind)
          Seq((a, b, sa, isLower))
        case _ => Seq.empty
      }
    }
    val candidates = for {
      (p1, lo, s1, true)  <- bounds
      (p2, hi, s2, false) <- bounds
      if s1 == s2 && p1.semanticEquals(p2)
      if p1.dataType.isInstanceOf[NumericType]
      if lo.dataType.isInstanceOf[NumericType] && hi.dataType.isInstanceOf[NumericType]
    } yield RangeMatch(p1, lo, hi, s1)
    candidates.headOption
  }

  private def hasCrossEquality(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (sideOf(a, left, right), sideOf(b, left, right)) match {
          case (Some(sa), Some(sb)) => sa != sb
          case _                    => false
        }
      case _ => false
    }

  private def binOf(e: Expression, width: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(width))), LongType)

  private def statNum(v: Any): Option[Double] = v match {
    case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
    case n: java.lang.Number                   => Some(n.doubleValue())
    case _                                     => None
  }

  /** Conf width when set; otherwise derived from the interval side's CBO
    * column stats: span(min(lo)..max(hi)) / min(rowCount, maxbins). The
    * min() clamp bounds the worst case — one interval covering the full
    * span explodes into at most maxbins+1 Generate rows, never ~rowCount.
    * None = don't rewrite.
    */
  private def widthFor(confWidth: String, intervals: LogicalPlan,
      lo: Expression, hi: Expression): Option[Double] = {
    if (confWidth.nonEmpty) {
      val w = confWidth.toDouble
      require(w > 0, s"$confKey must be positive, got $w")
      return Some(w)
    }
    val maxBins = conf.getConfString(maxBinsKey, "4096").toLong
    require(maxBins > 0, s"$maxBinsKey must be positive, got $maxBins")
    (lo.references.toSeq, hi.references.toSeq) match {
      case (Seq(la), Seq(ha)) =>
        val st = intervals.stats
        for {
          n      <- st.rowCount if n > 0
          loStat <- st.attributeStats.get(la)
          hiStat <- st.attributeStats.get(ha)
          lmin   <- loStat.min.flatMap(statNum)
          hmax   <- hiStat.max.flatMap(statNum)
          if hmax > lmin
        } yield (hmax - lmin) / math.min(n.toDouble, maxBins.toDouble)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val confWidth = conf.getConfString(confKey, "")

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if left.resolved && right.resolved =>
        val conjuncts = splitConjuncts(cond)
        if (hasCrossEquality(conjuncts, left, right)) j
        else (for {
          RangeMatch(p, lo, hi, pointOnLeft) <- findRange(conjuncts, left, right)
          intervals0 = if (pointOnLeft) right else left
          w <- widthFor(confWidth, intervals0, lo, hi)
        } yield {
          val (points, intervals) = if (pointOnLeft) (left, right) else (right, left)

          val pBinAlias = Alias(binOf(p, w), "__graft_bin")()
          val pointsP   = Project(points.output :+ pBinAlias, points)

          // Sequence is timezone-aware (for date/timestamp ranges) and is
          // unresolved until a timeZoneId is attached, even for longs.
          val seq = Sequence(binOf(lo, w), binOf(hi, w), None,
            Some(conf.sessionLocalTimeZone))
          val ivBinAttr = AttributeReference("__graft_bin_iv", LongType, nullable = false)()
          val gen = Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
            qualifier = None, generatorOutput = Seq(ivBinAttr), child = intervals)

          val binEq = EqualTo(pBinAlias.toAttribute, ivBinAttr)
          val (newLeft, newRight) =
            if (pointOnLeft) (pointsP, gen) else (gen, pointsP)
          val rewritten = Join(newLeft, newRight, Inner,
            Some(And(binEq, cond)), hint)
          Project(j.output, rewritten)
        }).getOrElse(j)
    }
  }
}
