package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — remove training documents that overlap an
  * evaluation set (the step every serious LLM pipeline runs so test data
  * can't leak into training; n-gram overlap matching is the standard public
  * recipe, e.g. GPT-3 appendix C / PaLM appendix).
  *
  * Construction: distinct word-`n` shingle hashes per doc (int32 murmur3 —
  * the shuffle carries 4-byte ints, never text), the benchmark shingle set
  * broadcast (eval suites are tiny next to a corpus), overlap counted per
  * doc and compared against `minOverlapFrac` of the doc's own shingles. At
  * 100 TB this is one narrow scan + a broadcast semi-join + a partial
  * count agg — no wide shuffle of document payloads.
  */
object Decontaminate {

  /** Per-doc overlap stats vs the benchmark set: (`doc_id` cols,
    * `n_shingles`, `n_matched`, `contaminated`).
    */
  def overlap(docs: DataFrame, benchmarks: DataFrame, idCol: String,
      textCol: String = "text", n: Int = 3,
      minOverlapFrac: Double = 0.5): DataFrame = {
    require(minOverlapFrac > 0 && minOverlapFrac <= 1, "minOverlapFrac in (0,1]")
    val docSh = docs.select(col(idCol),
      TextFunctions.hashedShingles(TextFunctions.tokens(col(textCol)), n).alias("__sh"))
    val benchSh = benchmarks
      .select(explode(TextFunctions.hashedShingles(
        TextFunctions.tokens(col(textCol)), n)).alias("__bsh"))
      .distinct()
    // explode_outer + coalesce: a doc with null text (null shingles) or an
    // empty shingle set still emits its per-doc stats row (n_shingles = 0,
    // contaminated = false) — an inner explode would drop it from the
    // output entirely while clean() silently retained it.
    val exploded = docSh
      .select(col(idCol),
        when(col("__sh").isNull, lit(0)).otherwise(size(col("__sh"))).alias("n_shingles"),
        explode_outer(col("__sh")).alias("__s"))
    exploded
      .join(broadcast(benchSh), exploded("__s") === benchSh("__bsh"), "left")
      .groupBy(col(idCol), col("n_shingles"))
      .agg(count(col("__bsh")).alias("n_matched"))
      .withColumn("contaminated",
        col("n_shingles") > 0 &&
          col("n_matched") >= col("n_shingles") * minOverlapFrac)
  }

  /** The decontaminated corpus: drop every contaminated doc. */
  def clean(docs: DataFrame, benchmarks: DataFrame, idCol: String,
      textCol: String = "text", n: Int = 3,
      minOverlapFrac: Double = 0.5): DataFrame = {
    val kill = overlap(docs, benchmarks, idCol, textCol, n, minOverlapFrac)
      .filter(col("contaminated")).select(col(idCol))
    docs.join(kill, Seq(idCol), "left_anti")
  }
}
