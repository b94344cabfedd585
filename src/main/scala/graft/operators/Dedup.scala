package graft.operators

import graft.functions.{TextFunctions, VectorFunctions, VectorKernels}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (north-star):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
  * near-dup.
  *
  * Scale discipline: every approximate path is *bucketed* — candidate pairs
  * come from equi-joins on band/bucket keys (shuffle on the bucket hash),
  * never from an all-pairs cartesian. Exact verification (Jaccard / cosine)
  * runs only inside buckets. This is the standard shingle→minhash→band→
  * bucket-join construction (Broder; Leskovec et al., "Mining of Massive
  * Datasets" ch. 3).
  */
object Dedup {

  /** Exact dedup on explicit keys — plain `dropDuplicates`, one hash
    * exchange on the keys.
    */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame = df.dropDuplicates(keys)

  /** Exact content dedup via fingerprint: keep one row per distinct md5 of
    * the (normalized) content column. Shuffles 16-byte digests, not
    * documents.
    */
  def exactByContent(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("__fp", md5(lower(trim(col(textCol)))))
      .dropDuplicates("__fp")
      .drop("__fp")

  /** MinHash signature column: for each of `numHashes` hash functions, the
    * min over the document's word-`shingleSize` shingles of
    * `murmur3(shingle, seed=i)`. Pure built-ins → whole-stage codegen.
    */
  def minhashSignature(textCol: Column, numHashes: Int, shingleSize: Int): Column = {
    val sh = TextFunctions.shingles(TextFunctions.tokens(textCol), shingleSize)
    array((0 until numHashes).map(i => array_min(transform(sh, s => hash(s, lit(i))))): _*)
  }

  /** MinHash + LSH near-duplicate candidate pairs with verified Jaccard.
    *
    * signature (numHashes) → `bands` bands of `numHashes/bands` rows; docs
    * agreeing on any full band meet in a bucket; bucket equi-join yields
    * candidates; exact shingle-set Jaccard filters to `minJaccard`.
    *
    * Returns `(id_a, id_b, jaccard)` with `id_a < id_b`. The join key is
    * `(band, band_hash)` so the shuffle is uniform; no cartesian anywhere.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      minJaccard: Double = 0.8
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val withSig = df
      .select(col(idCol).alias("__id"),
        array_distinct(TextFunctions.shingles(TextFunctions.tokens(col(textCol)), shingleSize))
          .alias("__sh"))
      .withColumn("__sig", array((0 until numHashes).map(i =>
        array_min(transform(col("__sh"), s => hash(s, lit(i))))): _*))

    val banded = withSig.select(
      col("__id"), col("__sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("__sig"), b * rows + 1, lit(rows))))).as(Seq("__band", "__bucket"))
    )

    val a = banded.select(col("__band"), col("__bucket"),
      col("__id").alias("id_a"), col("__sh").alias("sh_a"))
    val b = banded.select(col("__band"), col("__bucket"),
      col("__id").alias("id_b"), col("__sh").alias("sh_b"))

    a.join(b, Seq("__band", "__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).alias("jaccard"))
      .filter(col("jaccard") >= minJaccard)
      .dropDuplicates("id_a", "id_b")
  }

  /** SimHash near-dup clustering: 64-bit simhash per doc; docs sharing the
    * hash (Hamming 0) group directly. For Hamming ≤ k matching, block on
    * rotated prefix bands of the hash (same bucket-join shape as MinHash).
    * Returns the input with a `simhash` column.
    */
  def withSimhash(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("simhash", TextFunctions.simhash(TextFunctions.tokens(col(textCol))))

  /** n-gram Jaccard verified pairs, candidates from cheap blocking on shared
    * rare shingle hash (min shingle hash = cheapest 1-hash MinHash band).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String = "text",
      n: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    val withSh = df.select(col(idCol).alias("__id"),
      array_distinct(TextFunctions.shingles(TextFunctions.tokens(col(textCol)), n)).alias("__sh"))
      .withColumn("__minsh", array_min(transform(col("__sh"), s => hash(s))))
    val a = withSh.select(col("__minsh"), col("__id").alias("id_a"), col("__sh").alias("sh_a"))
    val b = withSh.select(col("__minsh"), col("__id").alias("id_b"), col("__sh").alias("sh_b"))
    a.join(b, "__minsh")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).alias("jaccard"))
      .filter(col("jaccard") >= minJaccard)
      .dropDuplicates("id_a", "id_b")
  }

  /** Embedding near-dup pairs: LSH-bucket on random-hyperplane sign bits,
    * verify cosine inside buckets. Deterministic planes from `seed`.
    * Returns `(id_a, id_b, cosine)` with cosine ≥ `minCosine`.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, planeBits: Int = 16, minCosine: Double = 0.95,
      seed: Long = 42L): DataFrame = {
    val bucketed = df.select(col(idCol).alias("__id"), col(vecCol).alias("__v"))
      .withColumn("__bucket", Similarity.hyperplaneBucket(col("__v"), dim, planeBits, seed))
    val a = bucketed.select(col("__bucket"), col("__id").alias("id_a"), col("__v").alias("v_a"))
    val b = bucketed.select(col("__bucket"), col("__id").alias("id_b"), col("__v").alias("v_b"))
    a.join(b, "__bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosineSim(col("v_a"), col("v_b")).alias("cosine"))
      .filter(col("cosine") >= minCosine)
      .dropDuplicates("id_a", "id_b")
  }
}
