package graft.contract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raised when a DataFrame violates a declared schema contract. */
final case class SchemaContractViolation(message: String) extends RuntimeException(message)

/** Hard schema-contract enforcement (reference semantics:
  * `dags/coin_data_pipeline_optimized.py:419-429` — cast to SILVER_SCHEMA_V1
  * with `safe=True`, any violation fails the partition).
  *
  * Spark's `nullable = false` is advisory on read, so enforcement is explicit:
  *  1. structural check — every contract column must exist (fail fast, no job);
  *  2. cast every column to its declared type;
  *  3. ONE distributed aggregation pass counting, per non-nullable column,
  *     rows that are NULL (or NaN for floating-point — pandas NaN and SQL NULL
  *     both violate a required field, SURVEY §7.4) or that failed the cast
  *     (non-null before cast, null after);
  *  4. throw [[SchemaContractViolation]] listing per-column counts if any.
  *
  * Scale posture: step 3 is a partial+final hash aggregate over constant-width
  * counters — one scan, no shuffle of data rows, safe at any input size.
  */
object SchemaContract {

  private def isFloating(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType => true
    case _                      => false
  }

  /** Per-column violation counts for `df` against `contract` (no throw). */
  def violationCounts(df: DataFrame, contract: StructType): Map[String, Long] = {
    val missing = contract.fieldNames.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      throw SchemaContractViolation(
        s"missing required columns: ${missing.mkString(", ")} (have: ${df.columns.mkString(", ")})")

    val checks: Seq[Column] = contract.fields.toSeq.flatMap { f =>
      val src  = col(f.name)
      // try_cast, not cast: under ANSI mode (Spark 4 default) a failed cast
      // throws mid-aggregation; the contract must *count* failures instead.
      val cast = src.try_cast(f.dataType)
      val castFail = sum(when(src.isNotNull && cast.isNull, 1L).otherwise(0L))
        .alias(s"${f.name}__cast")
      val nullViol =
        if (f.nullable) None
        else {
          val bad = if (isFloating(f.dataType)) cast.isNull || isnan(cast) else cast.isNull
          Some(sum(when(bad, 1L).otherwise(0L)).alias(s"${f.name}__null"))
        }
      castFail +: nullViol.toSeq
    }
    val row = df.agg(checks.head, checks.tail: _*).collect()(0)
    row.schema.fieldNames.zipWithIndex
      .map { case (n, i) => n -> (if (row.isNullAt(i)) 0L else row.getLong(i)) }
      .filter(_._2 > 0L)
      .toMap
  }

  /** Cast to the contract and throw [[SchemaContractViolation]] on any
    * nullability or cast violation. Returns the conformed DataFrame with
    * columns in contract order.
    */
  def enforce(df: DataFrame, contract: StructType): DataFrame = {
    val bad = violationCounts(df, contract)
    if (bad.nonEmpty) {
      val detail = bad.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k: $v rows" }.mkString("; ")
      throw SchemaContractViolation(s"schema contract violated — $detail")
    }
    df.select(contract.fields.toSeq.map(f => col(f.name).try_cast(f.dataType).alias(f.name)): _*)
  }
}
