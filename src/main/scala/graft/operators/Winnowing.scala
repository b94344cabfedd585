package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD
  * 2003 — the MOSS algorithm): hash every word `k`-gram, slide a window of
  * `w` consecutive hashes, and keep the minimum of each window. The
  * selected set is a position-robust fingerprint with the winnowing
  * guarantee: any shared run of at least `w + k - 1` tokens between two
  * documents yields at least one SHARED fingerprint, while the selected
  * density stays ~2/(w+1) of all grams — the local-algorithm sweet spot
  * between "fingerprint everything" (shingle DF) and "one hash per doc"
  * (SimHash/MinHash, which lose locality).
  *
  * Hashes are the first 16 hex digits of md5 of the gram string — kept AS
  * lowercase hex so "minimum" is a plain string compare (equal-length hex
  * orders exactly like the 64-bit integer it spells), which makes every
  * fingerprint replayable by any engine with md5 — no engine-specific
  * hash, no integer conversion.
  *
  * Everything is narrow per-row array work (token slice → gram hash →
  * window min → distinct): no shuffle, no UDF, no driver state; documents
  * stream through in one codegen'd projection. Downstream candidate
  * matching is the usual explode + equi-join on the fingerprint value —
  * the same bucketed shape as every other dedup path here.
  */
object Winnowing {

  /** Per-document fingerprint sets: (`idCol`, `fps` sorted distinct hex
    * hashes). Documents shorter than `k` tokens have no grams and an empty
    * set; documents with fewer than `w` grams fingerprint as the single
    * minimum over what they have (so short docs remain matchable).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String = "text",
      k: Int = 5, w: Int = 4): DataFrame = {
    require(k > 0 && w > 0, s"need k > 0 and w > 0, got k=$k w=$w")
    val t = col("__t")
    val h = col("__h")
    val grams = when(size(t) >= k,
      transform(sequence(lit(0), size(t) - k),
        i => concat_ws(" ", slice(t, i + 1, lit(k)))))
      .otherwise(array().cast("array<string>"))
    val wins = when(size(h) >= w,
      transform(sequence(lit(0), size(h) - w),
        i => array_min(slice(h, i + 1, lit(w)))))
      .otherwise(when(size(h) > 0, array(array_min(h)))
        .otherwise(array().cast("array<string>")))
    docs
      .withColumn("__t",
        filter(TextFunctions.tokens(col(textCol)), x => length(x) > 0))
      .withColumn("__h", transform(grams, g => substring(md5(g), 1, 16)))
      .select(col(idCol),
        array_sort(array_distinct(wins)).alias("fps"))
  }

  /** Candidate near-duplicate pairs: documents sharing at least
    * `minShared` fingerprints, with the shared count — an equi-join on the
    * fingerprint value (each fingerprint is a bucket; no cartesian), the
    * winnowing analogue of the MinHash band join.
    */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String = "text",
      k: Int = 5, w: Int = 4, minShared: Int = 2): DataFrame = {
    require(minShared > 0, "minShared must be positive")
    val fps = fingerprints(docs, idCol, textCol, k, w)
      .select(col(idCol).alias("id"), explode(col("fps")).alias("fp"))
    val a = fps.alias("a")
    val b = fps.alias("b")
    a.join(b, col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").alias("id_a"), col("b.id").alias("id_b"))
      .agg(count(lit(1)).alias("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
