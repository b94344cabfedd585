package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling operators for 100 TB-scale aggregation.
  *
  * Spark's hash aggregate already does a map-side partial pass, which
  * absorbs *moderate* key skew. Salting matters when a handful of hot keys
  * still overwhelm their reducer after partial aggregation — e.g. a
  * high-cardinality groupBy where partials can't fully combine (distinct-ish
  * state, huge per-key maps) or a downstream stage keyed on the hot key.
  * The pattern: aggregate on (key, salt) first — the hot key fans out over
  * `buckets` reducers — then merge the per-salt partials on the key alone.
  * Both phases are algebraic, so the result is identical to a direct
  * groupBy. (Skewed JOINs are left to AQE's skew-join splitting, which
  * Spark enables by default — don't hand-roll what the runtime re-plans.)
  */
object Skew {

  /** True when Spark's `hash()` accepts the type — MapType is unhashable
    * (non-deterministic iteration order), including nested inside arrays
    * and structs.
    */
  private def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType      => false
      case ArrayType(e, _) => hashable(e)
      case StructType(fs)  => fs.forall(f => hashable(f.dataType))
      case _               => true
    }
  }

  /** Deterministic per-row salt: murmur3 over `saltCols` when given, else
    * over every HASHABLE column of `df` (MapType — unhashable in Spark's
    * `hash()` — is skipped, so frames carrying map payloads still salt). A
    * hot key whose rows share one value (a constant or null-heavy metric —
    * the canonical skew case) still fans out as long as anything else in
    * the row varies; only fully-identical duplicate rows share a salt
    * bucket. Row-content hashing keeps replays stable under
    * repartitioning, which partition-id or rand() salts do not. Pass
    * `saltCols` to bound the per-row hash cost when the frame carries wide
    * payload columns (large text/binary) that shouldn't be hashed just to
    * derive a salt.
    */
  private[graft] def rowSalt(df: DataFrame, buckets: Int,
      saltCols: Seq[String] = Nil): Column = {
    val cols =
      if (saltCols.nonEmpty) saltCols
      else df.schema.fields.toSeq.filter(f => hashable(f.dataType)).map(_.name)
    if (cols.isEmpty) lit(0) // all-map row: no fan-out, but still correct
    else pmod(hash(cols.map(col): _*), lit(buckets))
  }

  /** Two-phase salted sum/count/min/max/avg of `valueCol` by `keys`.
    * Deterministic salt (murmur3 of the row's hashable columns, or of
    * `saltCols` when the caller designates discriminators — cheaper on wide
    * payloads) so replays are stable; sums accumulate in decimal so the
    * merge order can't perturb doubles.
    * Output columns: keys, `sum_val`, `n`, `min_val`, `max_val`, `avg_val`.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 16, saltCols: Seq[String] = Nil): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val keyCols = keys.map(col)
    val v = col(valueCol)
    val partial = df
      .withColumn("__salt", rowSalt(df, buckets, saltCols))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(
        sum(v.cast("decimal(18,6)")).alias("__psum"),
        count(v).alias("__pcnt"),
        min(v).alias("__pmin"),
        max(v).alias("__pmax"))
    partial
      .groupBy(keyCols: _*)
      .agg(
        sum(col("__psum")).cast("double").alias("sum_val"),
        sum(col("__pcnt")).alias("n"),
        min(col("__pmin")).alias("min_val"),
        max(col("__pmax")).alias("max_val"),
        (sum(col("__psum")).cast("double") / sum(col("__pcnt"))).alias("avg_val"))
  }
}
