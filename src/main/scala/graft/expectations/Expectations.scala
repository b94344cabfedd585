package graft.expectations

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative data-quality expectations — a small Spark-native equivalent of
  * the reference's Great Expectations suites
  * (`great_expectations/expectations/coin_data_suite.json:4-39`, the
  * 4-expectation checkpoint variant, and the fluent in-DAG suite at
  * `dags/coin_data_pipeline_optimized.py:535-538`).
  *
  * Row-level expectations compile to ONE aggregation pass
  * (`agg(sum(when(violated, 1)))` per expectation) — never one job per
  * expectation; schema-level expectations (existence, type) are checked
  * against the schema on the driver with zero jobs. Scale posture: a single
  * scan + constant-width partial/final agg regardless of input size.
  */
sealed trait Expectation {
  def name: String
  def column: String
}

/** Schema-level: checked against `df.schema`, no job. */
final case class ColumnExists(column: String) extends Expectation {
  val name = s"expect_column_to_exist($column)"
}

/** Schema-level: declared Spark type must be `dataType` (after any cast). */
final case class OfType(column: String, dataType: DataType) extends Expectation {
  val name = s"expect_column_values_to_be_of_type($column, ${dataType.simpleString})"
}

/** Row-level: value must not be NULL (NaN counts as a violation for floats). */
final case class NotNull(column: String) extends Expectation {
  val name = s"expect_column_values_to_not_be_null($column)"
}

/** Row-level: value > bound (or >= when `orEqual`). NULLs also violate. */
final case class GreaterThan(column: String, bound: Double, orEqual: Boolean = false)
    extends Expectation {
  val name = s"expect_column_values_to_be_${if (orEqual) ">=" else ">"}($column, $bound)"
}

/** Row-level: lo <= value <= hi. NULLs also violate. */
final case class Between(column: String, lo: Double, hi: Double) extends Expectation {
  val name = s"expect_column_values_to_be_between($column, $lo, $hi)"
}

final case class ExpectationResult(name: String, violations: Long) {
  def passed: Boolean = violations == 0L
}

final case class SuiteFailure(suite: String, failed: Seq[ExpectationResult])
    extends RuntimeException(
      s"expectation suite '$suite' failed: " +
        failed.map(r => s"${r.name} (${r.violations} bad rows)").mkString("; "))

final case class Suite(name: String, expectations: Seq[Expectation]) {

  private def isFloating(df: DataFrame, c: String): Boolean =
    df.schema.find(_.name == c).map(_.dataType).exists {
      case DoubleType | FloatType => true
      case _                      => false
    }

  private def violated(df: DataFrame, e: Expectation): Option[Column] = e match {
    case _: ColumnExists | _: OfType => None
    case NotNull(c) =>
      Some(if (isFloating(df, c)) col(c).isNull || isnan(col(c)) else col(c).isNull)
    case GreaterThan(c, b, orEq) =>
      val ok = if (orEq) col(c) >= b else col(c) > b
      Some(!coalesce(ok, lit(false)))
    case Between(c, lo, hi) =>
      Some(!coalesce(col(c) >= lo && col(c) <= hi, lit(false)))
  }

  /** Evaluate all expectations: schema-level on the driver, row-level in one
    * aggregation pass. Returns every result (passed and failed).
    */
  def validate(df: DataFrame): Seq[ExpectationResult] = {
    val schemaResults = expectations.collect {
      case e @ ColumnExists(c) =>
        ExpectationResult(e.name, if (df.columns.contains(c)) 0L else 1L)
      case e @ OfType(c, dt) =>
        val ok = df.schema.find(_.name == c).exists(_.dataType == dt)
        ExpectationResult(e.name, if (ok) 0L else 1L)
    }
    // A row-level expectation on a column the frame doesn't have can't be
    // compiled into the aggregation — report it failed instead of letting
    // Spark's analyzer throw UNRESOLVED_COLUMN.
    val (resolvable, unresolvable) =
      expectations.partition(e => df.columns.contains(e.column) ||
        !violated(df, e).isDefined)
    val missingResults =
      unresolvable.map(e => ExpectationResult(e.name, 1L))
    val rowLevel = resolvable.flatMap(e => violated(df, e).map(e -> _))
    val rowResults =
      if (rowLevel.isEmpty) Seq.empty
      else {
        val aggs = rowLevel.zipWithIndex.map { case ((_, c), i) =>
          sum(when(c, 1L).otherwise(0L)).alias(s"e$i")
        }
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        rowLevel.zipWithIndex.map { case ((e, _), i) =>
          ExpectationResult(e.name, if (row.isNullAt(i)) 0L else row.getLong(i))
        }
      }
    schemaResults ++ missingResults ++ rowResults
  }

  /** The row-level expectations as a single-row violation-count DataFrame
    * (columns `v0..vn` in suite order) — the same one-pass aggregation
    * `validate` runs, exposed as a composable query for the oracle harness.
    */
  def violationsDf(df: DataFrame): DataFrame = {
    val rowLevel = expectations.flatMap(e => violated(df, e))
    require(rowLevel.nonEmpty, s"suite '$name' has no row-level expectations")
    val aggs = rowLevel.zipWithIndex.map { case (c, i) =>
      sum(when(c, 1L).otherwise(0L)).alias(s"v$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Checkpoint semantics: validate and throw [[SuiteFailure]] on any failure. */
  def enforce(df: DataFrame): Seq[ExpectationResult] = {
    val results = validate(df)
    val failed  = results.filterNot(_.passed)
    if (failed.nonEmpty) throw SuiteFailure(name, failed)
    results
  }
}

/** The reference's three concrete suites. */
object Suites {

  /** 9-expectation suite (`great_expectations/expectations/coin_data_suite.json`). */
  val coinDataSuite: Suite = Suite(
    "coin_data_suite",
    Seq(
      ColumnExists("coin_id"),
      NotNull("coin_id"),
      ColumnExists("price_usd"),
      OfType("price_usd", DoubleType),
      GreaterThan("price_usd", 0d),
      ColumnExists("market_cap"),
      GreaterThan("market_cap", 0d),
      ColumnExists("timestamp"),
      NotNull("timestamp")
    )
  )

  /** 4-expectation checkpoint variant
    * (`great_expectations/checkpoints/coin_data_checkpoint.yml`).
    */
  val coinDataCheckpoint: Suite = Suite(
    "coin_data_checkpoint",
    Seq(
      NotNull("coin_id"),
      NotNull("price_usd"),
      OfType("price_usd", DoubleType),
      OfType("market_cap", DoubleType)
    )
  )

  /** Fluent in-DAG suite (`dags/coin_data_pipeline_optimized.py:535-538`). */
  val fluentSilverSuite: Suite = Suite(
    "fluent_silver_suite",
    Seq(
      NotNull("coin_id"),
      NotNull("market_cap"),
      NotNull("timestamp"),
      GreaterThan("price_usd", 0d, orEqual = true)
    )
  )
}
