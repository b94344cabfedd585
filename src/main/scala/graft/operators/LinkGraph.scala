package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for corpus curation. Host/page PageRank is the
  * classic web-scale quality prior (Page et al. 1999; Common-Crawl-era
  * pipelines rank hosts with it to weight or gate crawled documents), and
  * its computation shape — iterate (join ranks to edges → grouped sum) —
  * is THE canonical iterative-dataflow workload, so it doubles as the
  * engine's iterative-join proof alongside Lloyd's k-means
  * ([[Clustering]]). No reference analog; north-star surface.
  *
  * Scale shape: edges are pre-aggregated once to (src, dst, p) where p is
  * the row-normalized transition probability (multi-edges fold into
  * weights — one groupBy), then persisted: every iteration reuses the same
  * shuffle-partitioned edge table. An iteration is ONE equi-join of ranks
  * onto edges by src (ranks ≪ edges, so AQE broadcasts the rank side —
  * zero edge shuffle per iteration) + ONE grouped sum by dst, exactly the
  * map-side-combinable shape that scales linearly in |E|. Dangling mass
  * (rank sitting on nodes with no out-edges) is redistributed uniformly
  * each iteration via a single-row aggregate over the rank rows
  * themselves — the static dangling FLAG rides every rank row through the
  * checkpoints, so the mass needs no per-iteration join — as a broadcast
  * scalar, never a blocking driver round-trip (measured: see the loop
  * comment). Each
  * iteration's ranks are
  * `localCheckpoint`ed (eager) and the previous iteration's blocks then
  * freed: persist alone would keep the LOGICAL plan nesting every prior
  * iteration — analyzer work and plan-string memory grow per iteration
  * until the driver dies — whereas checkpointing truncates lineage to
  * O(1) depth (the Pregel discipline), so 50 iterations at 100 TB behave
  * like 5 at sf0.1. (On a real cluster with executor churn, swap the
  * local checkpoint for a reliable `checkpoint()` to durable storage —
  * same truncation, loss-tolerant.)
  */
object LinkGraph {

  /** Damped, weighted PageRank over an edge list. Multi-edges count as
    * weight (the observed-transition / random-surfer semantics); dangling
    * rank is redistributed uniformly. Returns (`node`, `rank`) for every
    * node appearing as src or dst; Σ rank = 1 at every iteration.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")

    // persist the folded edge list FIRST: everything below (outw, trans,
    // nodes, dangling) derives from it, and without the barrier the
    // caller's upstream lineage (often a wide window over raw events)
    // would re-run once per derivation
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .groupBy(col(srcCol).alias("src"), col(dstCol).alias("dst"))
      .agg(count(lit(1)).cast("double").alias("w"))
      .persist()
    val outw = e.groupBy(col("src")).agg(sum(col("w")).alias("ow"))
    // row-normalized transition matrix, persisted once, reused every iteration
    val trans = e.join(outw, Seq("src"))
      .select(col("src"), col("dst"), (col("w") / col("ow")).alias("p"))
      .persist()
    // the dangling flag (no out-edges: rank mass spreads uniformly) is
    // computed ONCE here and then RIDES THE RANK ROWS through every
    // checkpoint — the per-iteration dangling mass becomes a plain
    // aggregate over the already-materialized ranks instead of a
    // node-sized join against a persisted dangling set (one exchange and
    // its AQE scheduling round-trips fewer per iteration, same doubles)
    val nodes = e.select(col("src").alias("node"))
      .union(e.select(col("dst").alias("node")))
      .distinct()
      .join(outw.select(col("src").alias("node"), lit(true).alias("__out")),
        Seq("node"), "left")
      .select(col("node"), col("__out").isNull.alias("__dang"))
      .persist()
    val n = nodes.count() // bounded: the node-id domain, not the edge count
    require(n > 0, "pageRank needs at least one edge")

    // localCheckpoint (eager): materializes AND truncates lineage — the
    // next iteration's plan starts from a leaf, not from i nested joins
    var ranks = nodes
      .select(col("node"), col("__dang"), lit(1.0 / n).alias("rank"))
      .localCheckpoint()
    var i = 0
    while (i < iterations) {
      // dangling mass rides the plan as a broadcast one-row aggregate —
      // same double arithmetic as collecting it to the driver, but the
      // iteration is ONE action (the checkpoint) instead of a blocking
      // scalar round-trip plus the checkpoint. Same-data isolated A/B at
      // sf0.1 (5 iterations): 6.5 s cold / 4.6 warm here vs 9.8 / 4.8 for
      // the driver-collect form — the saved round-trips dominate cold,
      // warm ties within noise. The flag on the rank rows makes this a
      // join-free scan of the previous checkpoint.
      val dangMass = ranks
        .agg(coalesce(sum(when(col("__dang"), col("rank"))), lit(0.0))
          .alias("__dm"))
      val contrib = trans
        .join(ranks.select(col("node").alias("src"), col("rank")), Seq("src"))
        .groupBy(col("dst").alias("node"))
        .agg(sum(col("rank") * col("p")).alias("__c"))
      val next = ranks.select(col("node"), col("__dang"))
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangMass))
        .select(col("node"), col("__dang"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("__c"), lit(0.0)) + col("__dm") / lit(n.toDouble)))
            .alias("rank"))
        .localCheckpoint() // eager: runs the iteration, then drop the old blocks
      ranks.unpersist(blocking = false)
      ranks = next
      i += 1
    }
    trans.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    e.unpersist(blocking = false)
    ranks.select(col("node"), col("rank"))
  }
}
