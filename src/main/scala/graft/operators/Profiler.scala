package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler — the table-health summary every warehouse job
  * wants next to its loads: per column, row count, null count, exact
  * distinct count, and min/max rendered as strings. ALL columns profile in
  * ONE aggregation over one scan (never a job per column); the wide
  * aggregate row is reshaped to one output row per column with a narrow
  * explode. countDistinct over several columns plans as Expand + one
  * partial+final aggregate — shuffle bytes scale with distinct values, not
  * input rows.
  */
object Profiler {

  /** Profile `cols` (default: every column) of `df`. Output: one row per
    * column — (`col_name`, `n_rows`, `n_null`, `n_distinct`, `min_val`,
    * `max_val`).
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val target = if (cols.isEmpty) df.columns.toSeq else cols
    require(target.nonEmpty, "nothing to profile")
    require(target.forall(df.columns.contains),
      s"unknown columns: ${target.filterNot(df.columns.contains).mkString(", ")}")
    require(target.distinct.length == target.length, "duplicate columns to profile")
    // internal aliases are INDEX-derived and input references backtick-
    // quoted: a column name containing '.' (legal) would otherwise parse as
    // a struct-field path
    def ref(c: String) = col("`" + c.replace("`", "``") + "`")
    val aggExprs = target.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(ref(c)).alias(s"__c${i}_present"),
        countDistinct(ref(c)).alias(s"__c${i}_distinct"),
        min(ref(c)).cast("string").alias(s"__c${i}_min"),
        max(ref(c)).cast("string").alias(s"__c${i}_max"))
    } :+ count(lit(1)).alias("__n")
    val wide = df.agg(aggExprs.head, aggExprs.tail: _*)
    val perCol = target.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).alias("col_name"),
        col("__n").alias("n_rows"),
        (col("__n") - col(s"__c${i}_present")).alias("n_null"),
        col(s"__c${i}_distinct").alias("n_distinct"),
        col(s"__c${i}_min").alias("min_val"),
        col(s"__c${i}_max").alias("max_val"))
    }
    wide.select(explode(array(perCol: _*)).alias("p")).select(col("p.*"))
  }

  /** One-row corpus datasheet — the headline numbers a corpus release's
    * data card states (size, tokenization, language/source spread, exact
    * duplication): ONE aggregation pass over one scan (the multi-distinct
    * plans as a single Expand + partial/final agg, the token counts ride
    * the same projection, and the exact-dup rate reuses the md5 content
    * fingerprint every dedup path here uses). No joins, no second scan,
    * no driver loops — at 100 TB this is the cheapest complete summary
    * the engine can produce.
    *
    * Returns one row: `n_docs`, `n_null_text`, `n_tokens`, `avg_tokens`,
    * `p50_tokens`, `n_langs`, `n_sources`, `dup_rate` (fraction of rows
    * whose normalized content repeats an earlier row).
    */
  def corpusCard(docs: DataFrame, textCol: String = "text",
      langCol: String = "lang", sourceCol: String = "source"): DataFrame = {
    val toks = size(filter(
      split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+"),
      t => length(t) > 0)).cast("long")
    docs
      .select(col(textCol), col(langCol), col(sourceCol), toks.alias("__nt"),
        md5(coalesce(lower(trim(col(textCol))), lit(""))).alias("__fp"))
      .agg(
        count(lit(1)).alias("n_docs"),
        sum(when(col(textCol).isNull, 1L).otherwise(0L)).alias("n_null_text"),
        sum(col("__nt")).alias("n_tokens"),
        round(avg(col("__nt")), 6).alias("avg_tokens"),
        round(percentile(col("__nt"), lit(0.5)), 6).alias("p50_tokens"),
        countDistinct(col(langCol)).alias("n_langs"),
        countDistinct(col(sourceCol)).alias("n_sources"),
        round(lit(1.0) - countDistinct(col("__fp")).cast("double") / count(lit(1)), 6)
          .alias("dup_rate"))
  }

  /** Per-group winsorization — clamp a numeric column to its group's
    * [`lo`, `hi`] exact quantiles (linear interpolation, the SQL
    * `percentile_cont` everyone replays), the standard outlier treatment
    * before scale-sensitive downstream math (mean pooling, z-scores,
    * regression features). Group-wise rather than global because heavy
    * tails differ by source/domain — a global clamp flattens whole strata.
    *
    * One partial+final aggregate reduces each group to its two bounds
    * (`percentile` is an exact sort-based aggregate per group — fine for
    * group counts in the thousands; switch to `approx_percentile` when a
    * single group's values exceed executor memory); the bounds join back
    * broadcast (one row per group) and the clamp itself is a narrow
    * codegen'd `greatest(least(...))`. Adds `<valueCol>_w`; null values
    * stay null.
    */
  def winsorizeByGroup(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got $lo/$hi")
    val bounds = df.groupBy(col(groupCol)).agg(
      percentile(col(valueCol), lit(lo)).alias("__lo"),
      percentile(col(valueCol), lit(hi)).alias("__hi"))
    df.join(broadcast(bounds), Seq(groupCol), "left")
      // the null guard is load-bearing: Spark's least/greatest SKIP nulls,
      // so an unguarded clamp would rewrite a null value to the hi bound
      .withColumn(s"${valueCol}_w",
        when(col(valueCol).isNotNull,
          greatest(least(col(valueCol).cast("double"), col("__hi")), col("__lo"))))
      .drop("__lo", "__hi")
  }
}
