package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical ranker (BM25)
  * with a semantic one (embedding cosine) is the standard construction for
  * retrieval-based corpus work: eval-set mining, retrieval-augmented
  * decontamination, dedup candidate seeding, RAG corpus assembly. No
  * reference analog (the reference is a tabular ETL); north-star surface.
  *
  * Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
  * score(d) = Σ_r 1/(k + rank_r(d)) over the rankers that returned d.
  * RRF needs only RANKS, so heterogeneous scores (BM25 sums vs cosines)
  * never need calibration against each other — that's the whole point.
  *
  * Scale shape: one union of the per-ranker top-k lists + one groupBy on
  * the doc id. Each input is already top-k-bounded by its ranker, so the
  * fusion is O(Σ k_r) regardless of corpus size — the corpus-sized work
  * happened inside the rankers, where each engine's own top-k machinery
  * (TakeOrdered, ANN index) keeps it linear.
  */
object Retrieval {

  /** Fuse rankings by RRF. Each input must carry `idCol` and an integer
    * `rank` column (1-based, unique within that ranking — ties broken by
    * the ranker, not here). Output: (`idCol`, `rrf_score`, `n_rankers`),
    * one row per distinct id across the inputs.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k >= 0, s"k must be non-negative, got $k")
    rankings.iterator
      .map(r => r.select(col(idCol),
        (lit(1.0) / (lit(k) + col("rank"))).alias("__rrf")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("__rrf")).alias("rrf_score"),
        count(lit(1)).alias("n_rankers"))
  }
}
