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

  /** Late-interaction (MaxSim) scoring — the ColBERT construction
    * (Khattab & Zaharia, SIGIR 2020) over multi-vector representations:
    * both query and document are bags of sub-vectors, and
    * score(q, d) = Σ_i max_j ⟨q_i, d_j⟩ — each query part matches its best
    * document part, so local structure survives pooling. Here the
    * sub-vectors are `numSubVecs` contiguous slices of the stored single
    * vector (the degenerate-but-real multi-vector case; a true token-level
    * encoder would store `vecCol` as array-of-arrays and skip the slicing).
    *
    * Scale shape: the query's sub-vectors ride a broadcast one-row cross
    * join (never a shuffle); per-document scoring is builtin higher-order
    * functions — slice/transform/zip_with/aggregate, all codegen — so the
    * scan streams at full width and the only cross-executor movement is
    * the final top-k (TakeOrderedAndProject). Dots accumulate in DOUBLE
    * left-to-right, the order the oracle replays.
    */
  def maxSim(docs: DataFrame, query: DataFrame, idCol: String,
      vecCol: String, numSubVecs: Int = 4): DataFrame = {
    require(numSubVecs >= 1, s"numSubVecs must be >= 1, got $numSubVecs")
    // sub-vector length from the (fixed-dim) vector column; slice() is
    // 1-based, the start/length arithmetic is pinned to INT (Column `/`
    // is double division — an implicit truncation would silently
    // misalign sub-vectors for a non-divisible dim), and both sides'
    // divisibility is ENFORCED: docs by filter, the query by a loud
    // require rather than a silent mis-slice
    def subLen(vec: org.apache.spark.sql.Column) =
      (size(vec) / numSubVecs).cast("int")
    def subVecs(vec: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(numSubVecs - 1)), i =>
        transform(slice(vec, i * subLen(vec) + 1, subLen(vec)),
          x => x.cast("double")))
    // the query must be exactly ONE vector whose dim tiles into
    // numSubVecs parts — limit(1) on a multi-row frame would score
    // against an arbitrary row and differ run to run
    val qRows = query.select(size(col(vecCol)).alias("__d")).limit(2).collect()
    require(qRows.length == 1,
      s"maxSim query must be a single row, got ${if (qRows.isEmpty) 0 else "2+"}")
    require(!qRows.head.isNullAt(0), "maxSim query vector is NULL")
    require(qRows.head.getInt(0) % numSubVecs == 0,
      s"maxSim query vector dim ${qRows.head.getInt(0)} is not divisible " +
        s"by numSubVecs=$numSubVecs")
    val q = query.select(subVecs(col(vecCol)).alias("__qsubs"))
    docs
      .filter(col(vecCol).isNotNull &&
        pmod(size(col(vecCol)), lit(numSubVecs)) === 0)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        aggregate(col("__qsubs"), lit(0.0), (acc, qp) =>
          acc + array_max(transform(subVecs(col(vecCol)), dp =>
            aggregate(zip_with(qp, dp, (x, y) => x * y), lit(0.0),
              (a, b) => a + b)))).alias("maxsim"))
  }
}
