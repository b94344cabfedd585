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

  /** FUZZY decontamination — MinHash/LSH cross-set matching for the leak
    * [[overlap]]'s exact-shingle fraction misses: a benchmark item
    * paraphrased, re-punctuated, or partially quoted inside a training
    * document (the near-dup contamination studied by Lee et al. 2021 §6 and
    * the GPT-4 technical report's 50-char-substring variant).
    *
    * Cross-set construction, NOT the self-join dedup path: corpus docs and
    * benchmark items band separately, and candidates come from corpus-band
    * ⋈ BROADCAST(benchmark-bands) — an eval suite is thousands of items
    * (its banded table is a few MB), so the corpus-side scan never
    * shuffles at all and no corpus-internal pair is ever generated.
    * Verification joins the candidate ids back to both shingle projections
    * (benchmark side broadcast again) for exact Jaccard.
    *
    * Returns (`idCol`, `bench_id`, `jaccard` ≥ `minJaccard`).
    */
  def fuzzyOverlap(docs: DataFrame, benchmarks: DataFrame, idCol: String,
      benchIdCol: String = "bench_id", textCol: String = "text",
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      minJaccard: Double = 0.7): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1, "minJaccard in (0,1]")
    val cSh = Dedup.shingleProjection(docs, idCol, textCol, shingleSize)
    val bSh = Dedup.shingleProjection(benchmarks, benchIdCol, textCol, shingleSize)
    val cBands = Dedup.bandedBuckets(cSh, numHashes, bands)
      .select(col("__id").alias("__cid"), col("__band"), col("__bucket"))
    val bBands = Dedup.bandedBuckets(bSh, numHashes, bands)
      .select(col("__id").alias("__bid"), col("__band"), col("__bucket"))
    val candidates = cBands
      .join(broadcast(bBands), Seq("__band", "__bucket"))
      .select(col("__cid"), col("__bid"))
      .distinct()
    candidates
      .join(cSh.select(col("__id").alias("__cid"), col("__sh").alias("__csh")), Seq("__cid"))
      .join(broadcast(bSh.select(col("__id").alias("__bid"), col("__sh").alias("__bsh2"))),
        Seq("__bid"))
      .select(col("__cid").alias(idCol), col("__bid").alias(benchIdCol),
        (size(array_intersect(col("__csh"), col("__bsh2"))).cast("double") /
          size(array_union(col("__csh"), col("__bsh2"))).cast("double"))
          .alias("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** The fuzzily-decontaminated corpus: drop every doc with a near-dup
    * benchmark match.
    */
  def cleanFuzzy(docs: DataFrame, benchmarks: DataFrame, idCol: String,
      textCol: String = "text", numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3, minJaccard: Double = 0.7): DataFrame = {
    val kill = fuzzyOverlap(docs, benchmarks, idCol, "bench_id", textCol,
      numHashes, bands, shingleSize, minJaccard)
      .select(col(idCol)).distinct()
    docs.join(kill, Seq(idCol), "left_anti")
  }
}
