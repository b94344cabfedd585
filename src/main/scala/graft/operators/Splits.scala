package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test assignment — the split step of every
  * training-data pipeline, done CONTENT-STABLY: a document's split comes
  * from `murmur3(id, seed)` mod a fixed granularity, so the assignment
  * survives repartitioning, replays, and incremental reruns (a row-number
  * or rand() split does not), and documents added later never move
  * existing rows between splits.
  *
  * Narrow per-row expression, no shuffle; the chained when/otherwise over
  * cumulative weight boundaries stays in whole-stage codegen.
  */
object Splits {

  val granularity = 10000

  /** Adds a `split` column. `weights` are normalized; ordering decides which
    * split absorbs the rounding remainder (the last one).
    */
  def assignSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)] = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      seed: Int = 42): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    require(weights.map(_._1).distinct.length == weights.length, "duplicate split names")
    val total = weights.map(_._2).sum
    val bucket = pmod(hash(col(idCol), lit(seed)), lit(granularity))
    // cumulative upper boundaries in bucket units; last split takes the rest
    val bounds = weights.map(_._2 / total).scanLeft(0.0)(_ + _).tail
      .map(f => math.round(f * granularity))
    // every split must own at least one bucket: a weight under half a
    // bucket (< 1/(2*granularity) of the total) would round to an empty,
    // silently unreachable split
    require(bounds.zip(0L +: bounds.init).forall { case (hi, lo) => hi > lo },
      s"every split needs weight >= 1/$granularity of the total; " +
        s"got bucket bounds ${bounds.mkString(", ")}")
    val assigned = weights.init.zip(bounds.init).reverse
      .foldLeft(lit(weights.last._1): Column) { case (acc, ((name, _), hi)) =>
        when(bucket < hi, name).otherwise(acc)
      }
    df.withColumn("split", assigned)
  }

  /** [[assignSplit]] with a NEAR-DUP LEAKAGE GUARD: documents connected by
    * `pairs` (id_a, id_b — e.g. [[Dedup.minhashLshPairs]] output) are
    * assigned AS A CLUSTER, so a test document's paraphrase can never sit
    * in train (the held-out-metric leak measured by Lee et al. 2021 §5 —
    * splitting by row hash alone puts ~dup_rate of eval items' twins in
    * training). Each doc hashes by its connected-component representative;
    * docs in no pair keep their own id as representative, so their
    * assignment is IDENTICAL to plain [[assignSplit]] — adding a leak
    * guard never reshuffles the non-duplicated corpus. Split sizes stay
    * ~weights while clusters are small relative to the corpus (the usual
    * case; a corpus where one cluster is 20 % of rows has a worse problem
    * than split skew).
    */
  def assignSplitLeakageSafe(df: DataFrame, idCol: String, pairs: DataFrame,
      weights: Seq[(String, Double)] = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      seed: Int = 42): DataFrame = {
    val comps = Dedup.connectedComponents(pairs)
      .select(col("id").alias(idCol), col("component").alias("__rep0"))
    val withRep = df.join(comps, Seq(idCol), "left")
      .withColumn("__rep", coalesce(col("__rep0"), col(idCol)))
    assignSplit(withRep, "__rep", weights, seed).drop("__rep0", "__rep")
  }

  /** Deterministic global shuffle — the "shuffle your training data" step,
    * done as a PSEUDO-RANDOM PERMUTATION rather than `orderBy(rand())`
    * (non-reproducible) or `repartition` (only partition-local disorder):
    * rows are totally ordered by `md5(seed ‖ ":" ‖ id)`, a content-stable
    * key, so the same (corpus, seed) always yields the same order and a
    * different seed yields an uncorrelated one.
    *
    * Adds a `pos` column (0-based position in the shuffled order). Spark
    * executes the total order as a range-partitioned sort — sampled range
    * boundaries, all partitions sort in parallel — and the position is
    * assigned by `zipWithIndex`'s two-pass scheme (per-partition counts →
    * driver prefix-sum of #partitions longs → per-partition offset add).
    * No global window, no single-task stage anywhere; this is the one
    * genuinely per-partition-imperative step, hence the one RDD hop. Ties
    * are impossible (distinct ids ⇒ distinct digests modulo a 2⁻⁶⁴
    * collision), so the permutation is total and reproducible.
    *
    * `idCol` must be non-null and distinct: null ids all hash to the same
    * key (concat_ws skips nulls) and duplicate ids share one, making their
    * relative order engine-dependent.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Int = 42): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val key = md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string")))
    val sorted = df.withColumn("__shuffle_key", key).orderBy(col("__shuffle_key"))
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField("pos", LongType, nullable = false))
    // __shuffle_key was appended by withColumn, so it is always the LAST
    // field: dropping it is a bounded array copy, not a per-column
    // tuple-allocating collect (this map runs once per row of the corpus —
    // allocation here is measurable GC pressure at bench scale).
    val width = df.schema.length
    require(sorted.schema.fieldIndex("__shuffle_key") == width,
      "internal: shuffle key must be the appended last column")
    val indexed = sorted.rdd.zipWithIndex.map { case (r, i) =>
      val arr = new Array[Any](width + 1)
      var j = 0
      while (j < width) { arr(j) = r(j); j += 1 }
      arr(width) = i
      Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
    }
    df.sparkSession.createDataFrame(indexed, outSchema)
  }

  /** Deterministic per-stratum subsampling — the "downweight this source /
    * language / quality band" step of corpus mixing, done content-stably:
    * a row survives iff the first 4 hex digits of `md5(seed ‖ ":" ‖ id)`
    * fall below the stratum's fraction of the 16-bit key space. Same
    * (corpus, fractions, seed) ⇒ same sample; rows added later never flip
    * existing keep/drop decisions (a `rand()` or `sampleBy` draw does
    * not survive replays).
    *
    * The per-stratum threshold is resolved at PLAN time into a chained
    * `when` over 4-char lowercase-hex literals, so the whole operator is
    * one narrow codegen'd filter — no join, no shuffle, no driver state;
    * it runs at scan speed on 100 TB. Hex-string comparison is used
    * instead of a numeric cast because equal-length lowercase hex orders
    * lexicographically exactly like the number it spells, and both Spark
    * and DuckDB print md5 the same way — the oracle replays the predicate
    * verbatim. Fractions are quantized to 1/65536 (worst-case bias
    * 0.0015%); a fraction ≥ 1 keeps the whole stratum, and a stratum
    * absent from `fractions` keeps `default`.
    */
  def sampleStratified(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], default: Double = 0.0,
      seed: Int = 42): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1) && default >= 0 && default <= 1,
      "fractions must be in [0, 1]")
    def hexBound(f: Double): String = f"${math.round(f * 65536).min(65536)}%05x"
    val key = substring(md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string"))), 1, 4)
    // '0' + 4-hex-digit key compares against the 5-digit bound, so f = 1.0
    // ("10000") keeps everything without a special case
    val bound = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(hexBound(default)): Column) { case (acc, (name, f)) =>
        when(col(strataCol) === name, lit(hexBound(f))).otherwise(acc)
      }
    df.filter(concat(lit("0"), key) < bound)
  }

  /** Distribution-matching rejection sampler — reshape `source` so the
    * histogram of `binCol` matches `target`'s (the classic histogram-
    * matching construction behind "make the pretraining mix look like the
    * target domain" resampling; DSIR's importance weights are the
    * continuous cousin, this is the exact discrete form). Per bin b:
    * ratio r_b = (t_b/T)/(s_b/S); acceptance a_b = r_b / max_b r_b — the
    * scaling that makes the best-represented target bin keep everything,
    * which yields the LARGEST subsample whose bin shares match the
    * target's exactly in expectation.
    *
    * Acceptance is content-stable, not rand(): row passes iff its 8-hex
    * md5(seed:id) prefix compares below the bin's threshold string
    * (`floor(a_b·2³²)` as zero-padded lowercase hex; equal-length hex
    * compares like the integer it spells, and a_b = 1 gets the sentinel
    * "g", above every hex digit). Replays, repartitions, and incremental
    * reruns keep the same rows.
    *
    * Scale shape: two bin-histogram aggregations (map-side partial, ≤
    * |bins| rows out), one-row totals riding broadcast cross joins, and a
    * broadcast join of the ≤|bins| threshold table back onto the source —
    * the corpus itself is never shuffled. Ratios are computed in DOUBLE
    * from exact counts (cast-then-multiply, no 64-bit overflow at any
    * corpus size under 2⁵³ rows).
    *
    * Bins with target mass but NO source rows are unmatchable (nothing to
    * accept) and are ignored by the max — the sampler matches the target
    * restricted to the source's support. Null bins are dropped up front.
    */
  def matchDistribution(source: DataFrame, target: DataFrame, idCol: String,
      binCol: Column, seed: Int = 42): DataFrame = {
    val src = source.withColumn("__bin", binCol).filter(col("__bin").isNotNull)
    val tgt = target.withColumn("__bin", binCol).filter(col("__bin").isNotNull)
    val sHist = src.groupBy(col("__bin")).agg(count(lit(1)).alias("__s"))
    val tHist = tgt.groupBy(col("__bin")).agg(count(lit(1)).alias("__t"))
    val sTot = src.agg(count(lit(1)).alias("__stot"))
    val tTot = tgt.agg(count(lit(1)).alias("__ttot"))
    val hist = sHist.join(tHist, Seq("__bin"), "left").na.fill(0L, Seq("__t"))
      .crossJoin(broadcast(sTot)).crossJoin(broadcast(tTot))
      .withColumn("__r",
        col("__t").cast("double") * col("__stot").cast("double") /
          (col("__s").cast("double") * col("__ttot").cast("double")))
    val rMax = hist.agg(max(col("__r")).alias("__rmax"))
    val thresholds = hist.crossJoin(broadcast(rMax))
      .withColumn("__a", col("__r") / col("__rmax"))
      .withColumn("__th", when(col("__a") >= 1, lit("g"))
        .otherwise(format_string("%08x",
          floor(col("__a") * lit(4294967296.0)))))
      .select(col("__bin"), col("__th"))
    val key = substring(md5(concat_ws(":",
      lit(seed.toString), col(idCol).cast("string"))), 1, 8)
    src.join(broadcast(thresholds), Seq("__bin"))
      .filter(key < col("__th"))
      .drop("__th")
  }

  /** Greedy corpus selection under a global TOKEN budget — "fill 10 B
    * training tokens with the best-scoring documents": rows are taken in
    * (`scoreCol` desc, `idCol` asc) order while the running token total
    * (including the current row) stays within `budget`. The id tiebreak
    * makes the selection total and replayable.
    *
    * The running total is NOT a global window (which would serialize into
    * one task): Spark executes the order as a range-partitioned sort, a
    * first pass reduces each partition to one token subtotal, the driver
    * prefix-sums #partitions longs, and a second pass filters each
    * partition against its start offset — the same two-pass zipWithIndex
    * scheme as [[deterministicShuffle]], all partitions in parallel. Rows
    * with null score/tokens are excluded up front (a null would poison the
    * running sum); negative token counts are rejected loudly.
    *
    * Returns the selected rows with their 0-based `rank` and cumulative
    * `cum_tokens` (≤ `budget`).
    */
  def selectByTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
      scoreCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val clean = df.filter(col(scoreCol).isNotNull && col(tokenCol).isNotNull)
    val sorted = clean.orderBy(col(scoreCol).desc, col(idCol).asc)
    val tokIdx = sorted.schema.fieldIndex(tokenCol)
    val rdd = sorted.rdd
    // one stats job: (token subtotal, row count) per partition
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L; var c = 0L
      it.foreach { r =>
        val t = r.get(tokIdx).asInstanceOf[Number].longValue
        require(t >= 0, s"negative token count $t (partition $pid)")
        s += t; c += 1L
      }
      Iterator.single((pid, s, c))
    }.collect().sortBy(_._1)
    val tokenOffsets = stats.map(_._2).scanLeft(0L)(_ + _)
    val rankOffsets = stats.map(_._3).scanLeft(0L)(_ + _)
    val outSchema = StructType(sorted.schema.fields ++
      Seq(StructField("rank", LongType, nullable = false),
        StructField("cum_tokens", LongType, nullable = false)))
    val selected = rdd.mapPartitionsWithIndex { (pid, it) =>
      // partitions fully inside the budget stream through; ones fully past
      // it emit nothing after the first row; the boundary partition stops
      // at the first overflow (cum is monotone within the sorted run)
      var cum = tokenOffsets(pid)
      var rank = rankOffsets(pid) - 1L
      it.map { r =>
        val t = r.get(tokIdx).asInstanceOf[Number].longValue
        cum += t; rank += 1L
        (cum <= budget, Row.fromSeq(r.toSeq :+ rank :+ cum))
      }.takeWhile(_._1).map(_._2)
    }
    df.sparkSession.createDataFrame(selected, outSchema)
  }

  /** PER-GROUP token budget — "cap every domain at B training tokens":
    * within each group, rows are taken in (`scoreCol` desc, `idCol` asc)
    * order while the running group token total (including the current row)
    * stays within `budget`. The per-domain cap step of mixture curation —
    * [[selectByTokenBudget]] fills one global budget; this holds every
    * group to the same ceiling so no domain dominates the mix.
    *
    * One hash-shuffle on the group key + a running-sum window per group —
    * the canonical grouped-prefix-sum shape (same cost envelope as
    * [[samplePerGroup]]); no driver pass, because the budget is per-group
    * and each group's cumulative sum lives inside its own window
    * partition. Rows with null score/tokens are excluded up front;
    * negative token counts are rejected loudly in-plan.
    *
    * Returns the selected rows plus their 1-based in-group `grp_rank` and
    * running `cum_tokens` (≤ `budget`).
    */
  def selectByTokenBudgetPerGroup(df: DataFrame, groupCol: String,
      idCol: String, tokenCol: String, scoreCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val guarded = when(col(tokenCol) < 0,
        raise_error(concat(lit(s"negative token count in $tokenCol: "),
          col(tokenCol).cast("string"))))
      .otherwise(col(tokenCol))
    df.filter(col(scoreCol).isNotNull && col(tokenCol).isNotNull)
      .withColumn("cum_tokens",
        sum(guarded).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("grp_rank", row_number().over(w).cast("long"))
      .filter(col("cum_tokens") <= budget)
  }

  /** Weighted sampling WITHOUT replacement, content-stably — the
    * Efraimidis–Spirakis A-Res construction (Inf. Proc. Letters 2006):
    * each row draws key = ln(u)/w from a uniform u and its weight w, and
    * the k LARGEST keys are an exact weighted sample without replacement.
    * "Sample 100k documents proportional to quality" with replay-stable
    * results: u comes from the row's md5(seed:id), not rand(), so the
    * draw survives repartitioning and reruns.
    *
    * u is built from the first 13 md5 hex digits as Σ digit_i · 16^-i —
    * 13 × 4 = 52 bits, so u is EXACT in an IEEE double in any engine (no
    * summation-order concern), shifted by one ulp₁₆ so ln never sees 0.
    * The only cross-engine float is ln itself, so selection ranks on the
    * 6-decimal ROUNDED key with an id tiebreak (the suite's determinism
    * convention — same device as BM25).
    *
    * Scale shape: one narrow per-row projection (all codegen HOFs) into
    * a global top-k — `TakeOrderedAndProject`, per-partition heaps of k,
    * no shuffle of the corpus. Rows with null/non-positive weight are
    * excluded up front (a zero weight divides to −∞ anyway: never drawn).
    *
    * Returns the selected rows with `sel_key` (the rounded ranking key).
    */
  def sampleWeighted(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Int = 42): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = substring(md5(concat_ws(":",
      lit(seed.toString), col(idCol).cast("string"))), 1, 13)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__h", h)
      .withColumn("__u", expr(
        """aggregate(transform(sequence(1, 13), i ->
          |  (instr('0123456789abcdef', substr(__h, i, 1)) - 1) *
          |    power(16.0d, -i)),
          |cast(0.0 as double), (a, b) -> a + b)""".stripMargin) +
        lit(math.pow(16.0, -13)))
      .withColumn("sel_key",
        round(log(col("__u")) / col(weightCol).cast("double"), 6))
      .orderBy(col("sel_key").desc, col(idCol).asc)
      .limit(k)
      .drop("__h", "__u")
  }

  /** Deterministic fixed-size sample per group — "keep at most n documents
    * per domain/source/cluster", the cap step of domain-balanced corpus
    * curation. Within each group, rows are ranked by `md5(seed ‖ ":" ‖ id)`
    * (a content-stable pseudo-random order, so the survivors are an
    * unbiased draw yet identical across replays) and the first `n` kept.
    *
    * Executes as one hash-shuffle on the group key + per-group sort — the
    * same cost as any group-by at 100 TB. Groups are typically domains, so
    * skew is bounded by the corpus' domain distribution; a pathological
    * giant group costs one wide sort task but cannot break the semantics.
    */
  def samplePerGroup(df: DataFrame, groupCol: String, idCol: String, n: Int,
      seed: Int = 42): DataFrame = {
    require(n > 0, "n must be positive")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string")))
    df.withColumn("__rk",
        row_number().over(Window.partitionBy(col(groupCol)).orderBy(key)))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }
}
