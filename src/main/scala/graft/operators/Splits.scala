package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test assignment — the split step of every
  * training-data pipeline, done CONTENT-STABLY: a document's split comes
  * from `murmur3(id, seed)` mod a fixed granularity, so the assignment
  * survives repartitioning, replays, and incremental reruns (a row-number
  * or rand() split does not), and documents added later never move
  * existing rows between splits.
  *
  * Narrow per-row expression, no shuffle; the chained when/otherwise over
  * cumulative weight boundaries stays in whole-stage codegen.
  */
object Splits {

  val granularity = 10000

  /** Adds a `split` column. `weights` are normalized; ordering decides which
    * split absorbs the rounding remainder (the last one).
    */
  def assignSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)] = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      seed: Int = 42): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    require(weights.map(_._1).distinct.length == weights.length, "duplicate split names")
    val total = weights.map(_._2).sum
    val bucket = pmod(hash(col(idCol), lit(seed)), lit(granularity))
    // cumulative upper boundaries in bucket units; last split takes the rest
    val bounds = weights.map(_._2 / total).scanLeft(0.0)(_ + _).tail
      .map(f => math.round(f * granularity))
    // every split must own at least one bucket: a weight under half a
    // bucket (< 1/(2*granularity) of the total) would round to an empty,
    // silently unreachable split
    require(bounds.zip(0L +: bounds.init).forall { case (hi, lo) => hi > lo },
      s"every split needs weight >= 1/$granularity of the total; " +
        s"got bucket bounds ${bounds.mkString(", ")}")
    val assigned = weights.init.zip(bounds.init).reverse
      .foldLeft(lit(weights.last._1): Column) { case (acc, ((name, _), hi)) =>
        when(bucket < hi, name).otherwise(acc)
      }
    df.withColumn("split", assigned)
  }

  /** Deterministic global shuffle — the "shuffle your training data" step,
    * done as a PSEUDO-RANDOM PERMUTATION rather than `orderBy(rand())`
    * (non-reproducible) or `repartition` (only partition-local disorder):
    * rows are totally ordered by `md5(seed ‖ ":" ‖ id)`, a content-stable
    * key, so the same (corpus, seed) always yields the same order and a
    * different seed yields an uncorrelated one.
    *
    * Adds a `pos` column (0-based position in the shuffled order). Spark
    * executes the total order as a range-partitioned sort — sampled range
    * boundaries, all partitions sort in parallel — and the position is
    * assigned by `zipWithIndex`'s two-pass scheme (per-partition counts →
    * driver prefix-sum of #partitions longs → per-partition offset add).
    * No global window, no single-task stage anywhere; this is the one
    * genuinely per-partition-imperative step, hence the one RDD hop. Ties
    * are impossible (distinct ids ⇒ distinct digests modulo a 2⁻⁶⁴
    * collision), so the permutation is total and reproducible.
    *
    * `idCol` must be non-null and distinct: null ids all hash to the same
    * key (concat_ws skips nulls) and duplicate ids share one, making their
    * relative order engine-dependent.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Int = 42): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val key = md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string")))
    val sorted = df.withColumn("__shuffle_key", key).orderBy(col("__shuffle_key"))
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField("pos", LongType, nullable = false))
    val keyIdx = sorted.schema.fieldIndex("__shuffle_key")
    val indexed = sorted.rdd.zipWithIndex.map { case (r, i) =>
      val vals = r.toSeq.zipWithIndex.collect { case (v, j) if j != keyIdx => v }
      Row.fromSeq(vals :+ i)
    }
    df.sparkSession.createDataFrame(indexed, outSchema)
  }
}
