package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over a documents table (`doc_id`, `text`, …) —
  * the north-star LLM-corpus preparation surface: language ID, quality
  * scoring, token counting, fingerprinting, term statistics.
  *
  * All per-document ops are narrow (no shuffle) built-in/codegen expressions;
  * the only shuffles are the explicit term-frequency aggregations. At 100 TB
  * these run as map-side partial aggregates; nothing collects to the driver.
  */
object TextAnalysis {

  /** English-ish function words used for stopword/quality features. */
  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on", "with")

  /** Tiny per-language function-word profiles for the n-gram/word heuristic
    * language detector. Public-knowledge function words per language.
    */
  val languageProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不", "这", "人")
  )

  /** Per-document analysis columns: token counts, quality features, and both
    * fingerprints. One narrow projection, no shuffle.
    */
  def analyze(docs: DataFrame, textCol: String = "text",
      stopwords: Seq[String] = defaultStopwords): DataFrame = {
    val text = col(textCol)
    val toks = TextFunctions.tokens(text)
    docs
      .withColumn("n_tokens", TextFunctions.tokenCount(text))
      .withColumn("n_subwords", TextFunctions.approxBpeTokenCount(text))
      .withColumn("stop_ratio", round(TextFunctions.stopwordRatio(toks, stopwords), 6))
      .withColumn("punct_ratio", round(TextFunctions.punctRatio(text), 6))
      .withColumn("quality_score", TextFunctions.qualityScore(text, stopwords))
      .withColumn("fingerprint_md5", md5(text))
      .withColumn("fingerprint_roll", TextFunctions.rollingHash(text))
  }

  /** Quality pruning by stratum — keep each stratum's rows at or above its
    * own `p`-quantile of `scoreCol` (per-language thresholds are the
    * standard recipe: a global cutoff would gut low-resource languages
    * whose score distributions sit lower).
    *
    * The thresholds frame is one row per stratum → broadcast join; the
    * corpus scan stays narrow. `exact = false` (default) estimates the
    * quantile with `approx_percentile` (t-digest-style mergeable sketch,
    * the only sane choice at 100 TB); `exact = true` uses exact
    * `percentile` (linear interpolation — pairs with DuckDB
    * `quantile_cont`) for oracle-checked runs at test scale.
    *
    * Rows with a null score (or a null stratum) are dropped — a null never
    * satisfies `score >= threshold`, and a null stratum has no quantile.
    */
  def quantileQualityFilter(docs: DataFrame, strataCol: String, scoreCol: String,
      p: Double = 0.25, exact: Boolean = false): DataFrame = {
    require(p > 0 && p < 1, "p must be in (0,1)")
    val q =
      if (exact) percentile(col(scoreCol), lit(p))
      else percentile_approx(col(scoreCol), lit(p), lit(10000))
    val thresholds = docs.groupBy(col(strataCol)).agg(q.alias("__thr"))
    docs.join(broadcast(thresholds), Seq(strataCol))
      .filter(col(scoreCol).cast("double") >= col("__thr").cast("double"))
      .drop("__thr")
  }

  /** Heuristic language ID: score each candidate language by the share of
    * tokens (or characters, for zh) matching its function-word profile and
    * take the argmax; `und` when nothing matches. Pure built-ins → codegen.
    */
  def langIdCol(textCol: Column,
      profiles: Map[String, Seq[String]] = languageProfiles): Column = {
    val langs = profiles.toSeq.sortBy(_._1)
    // Non-zh profile matching is ONE codegen'd token_set_counts pass (a
    // per-language interpreted filter/array_contains would cost
    // tokens × languages × profile-size string compares per row); the
    // token array and score vector are let-bound so interpreted arms never
    // re-expand the tokenizer or the counts.
    val wordLangs = langs.filter(_._1 != "zh")
    TextFunctions.bindOnce(TextFunctions.tokens(textCol)) { toks =>
      TextFunctions.bindOnce(
        TextFunctions.tokenSetCounts(toks, wordLangs.map(_._2))) { counts =>
        var wordIdx = 0
        val scores: Seq[Column] = langs.map { case (lang, words) =>
          if (lang == "zh")
            // zh has no whitespace tokens: count profile characters present.
            size(filter(array(words.map(lit): _*), w => textCol.contains(w)))
              .cast("double")
          else {
            wordIdx += 1
            when(size(toks) === 0, 0.0)
              .otherwise(element_at(counts, wordIdx).cast("double") /
                size(toks).cast("double"))
          }
        }
        TextFunctions.bindOnce(array(scores: _*)) { sa =>
          val best = array_max(sa)
          langs.zipWithIndex.foldLeft(lit("und")) { case (acc, ((lang, _), i)) =>
            when(element_at(sa, i + 1) === best && best > 0.0, lit(lang)).otherwise(acc)
          }
        }
      }
    }
  }

  def withLanguage(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("lang_pred", langIdCol(col(textCol)))

  /** Token-budget sequence packing, sharded contiguous-fill flavor.
    *
    * Documents are hash-sharded (`shard = pmod(hash(orderCol), numShards)` by
    * default, or any caller-supplied shard expression), then WITHIN each shard
    * laid end to end in `orderCol` order with
    * `bin_id = floor(preceding-token-total-in-shard / budget)`. The packed
    * identity is the pair (`shard`, `bin_id`). The running-sum window
    * partitions by shard, so at 100 TB the sort is per-shard-parallel — there
    * is never a single-partition global window Exchange; `numShards` should be
    * sized so one shard's rows fit a task comfortably (corpus_tokens /
    * numShards ≲ a few GiB of (id, count) rows).
    *
    * A document that straddles a boundary stays whole in the earlier bin, so
    * a bin can exceed `budget` by up to that document's length — consumers
    * either truncate/split the straddler (the usual LLM pretraining choice)
    * or cap document length upstream. `numShards = 1` degenerates to the
    * single-sequence global packing (small-data / strict-order use only).
    * A caller-supplied `shard` is honored regardless of `numShards`.
    */
  def packSequences(docs: DataFrame, orderCol: String, tokenCol: String,
      budget: Long, numShards: Int = 64, shard: Option[Column] = None): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(numShards > 0, "numShards must be positive")
    // The output columns are part of the contract: refuse to silently
    // clobber caller data, and remind multi-shard consumers that `bin_id`
    // alone is NOT a pack identity. An input 'shard' column is fine when
    // the caller explicitly supplies the shard expression (typically
    // shard = Some(col("shard")) — they own that column).
    require(!docs.columns.contains("bin_id"),
      "packSequences emits 'bin_id' — rename the input's column; note the " +
        "pack identity is the PAIR (shard, bin_id), bin_id restarts at 0 " +
        "in every shard")
    require(shard.isDefined || !docs.columns.contains("shard"),
      "packSequences emits 'shard' — rename the input's column, or pass it " +
        "explicitly via the shard parameter")
    // a caller-supplied shard is honored regardless of numShards (same
    // contract as chunkConcatenated — numShards only sizes the DEFAULT
    // hash sharding, it must not silently discard an explicit expression)
    val shardCol = shard.getOrElse(
      if (numShards == 1) lit(0L)
      else pmod(hash(col(orderCol)), lit(numShards))).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .withColumn("shard", shardCol)
      .withColumn("__cum_before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin_id", floor(col("__cum_before") / budget).cast("long"))
      .drop("__cum_before")
  }

  /** Sequence-length bucketing for padded-batch assembly — the
    * training-loader move that minimizes padding waste when batches are
    * padded to their longest member: documents land in the length bucket
    * whose range covers them (`bounds` ascending; bucket i = count of
    * bounds strictly below the length, so the last bucket is open-ended),
    * are hash-sharded WITHIN the bucket, and batched `batchSize` docs at
    * a time in (length, id) order — near-equal lengths share a batch, so
    * `padded_len − len` stays small.
    *
    * Scale shape: bucket assignment is a narrow codegen'd projection (a
    * when-chain over the broadcast bounds); the batching window
    * partitions by (`bucket`, `shard`), NEVER by bucket alone — a handful
    * of buckets would funnel 100 TB through a handful of partitions,
    * while bucket × numShards keeps every window task-sized, at the cost
    * of per-shard (not global) batch packing — the same trade
    * [[packSequences]] documents. Emits per-doc `bucket`, `shard`,
    * `batch_id` (restarts at 0 per (bucket, shard)) and `padded_len`
    * (the batch max every member pads to).
    */
  def lengthBucketBatches(docs: DataFrame, idCol: String, tokenCol: String,
      bounds: Seq[Long], batchSize: Int, numShards: Int = 64,
      shard: Option[Column] = None): DataFrame = {
    require(bounds.nonEmpty && bounds == bounds.sorted && bounds.distinct == bounds,
      s"bounds must be non-empty, ascending and distinct, got $bounds")
    require(batchSize > 0, "batchSize must be positive")
    require(numShards > 0, "numShards must be positive")
    Seq("bucket", "batch_id", "padded_len").foreach(c =>
      require(!docs.columns.contains(c),
        s"lengthBucketBatches emits '$c' — rename the input's column; the " +
          "batch identity is the TRIPLE (bucket, shard, batch_id)"))
    require(shard.isDefined || !docs.columns.contains("shard"),
      "lengthBucketBatches emits 'shard' — rename the input's column, or " +
        "pass it explicitly via the shard parameter")
    val shardCol = shard.getOrElse(
      if (numShards == 1) lit(0L)
      else pmod(hash(col(idCol)), lit(numShards))).cast("long")
    val bucketCol = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(tokenCol) > b, 1).otherwise(0)
    }
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket"), col("shard"))
      .orderBy(col(tokenCol).asc, col(idCol).asc)
    val wBatch = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket"), col("shard"), col("batch_id"))
    docs
      .withColumn("shard", shardCol)
      .withColumn("bucket", bucketCol)
      .withColumn("batch_id",
        ((row_number().over(wRank) - 1) / batchSize).cast("long"))
      .withColumn("padded_len", max(col(tokenCol)).over(wBatch).cast("long"))
  }

  /** Concat-and-chunk packing — the GPT-style epoch layout: documents are
    * concatenated in a deterministic order and the token stream is cut
    * into fixed `seqLen` training sequences, documents crossing sequence
    * boundaries (no padding, no discarded remainders except the stream
    * tail). This is the OTHER packing discipline next to [[packSequences]]
    * (which bins whole documents, first-fit): chunking wastes zero tokens
    * but splits documents; binning keeps documents intact but pads.
    *
    * Output: one row per (document × sequence it spans) — `shard`,
    * `seq_id` (0-based within shard), `piece_start` (token offset within
    * the document), `piece_len`. Invariants (spec-pinned): piece lengths
    * per document sum to the document's tokens; per (shard, seq_id) they
    * sum to exactly `seqLen` except each shard's final sequence; pieces
    * are contiguous in both views.
    *
    * Scale shape: shards are independent token streams (the real-pipeline
    * parallelization unit), so the running offset is a per-shard window
    * cumsum — one hash shuffle on the shard key, sequences explode
    * per-row with no further movement. All integer arithmetic, so the
    * oracle replays it exactly.
    *
    * Determinism contract: `orderCol` must be UNIQUE within each shard —
    * the running offset is a cumsum in `orderCol` order, and ties would
    * make every downstream offset depend on arbitrary row order. This is
    * ENFORCED in-plan (a lag-equality guard riding the same sort raises
    * a named error on the first duplicate) rather than assumed. A
    * caller-supplied `shard` is honored regardless of `numShards`.
    */
  def chunkConcatenated(docs: DataFrame, orderCol: String, tokenCol: String,
      seqLen: Long, numShards: Int = 64, shard: Option[Column] = None): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(numShards > 0, "numShards must be positive")
    Seq("seq_id", "piece_start", "piece_len").foreach(c =>
      require(!docs.columns.contains(c),
        s"chunkConcatenated emits '$c' — rename the input's column"))
    require(shard.isDefined || !docs.columns.contains("shard"),
      "chunkConcatenated emits 'shard' — rename the input's column, or " +
        "pass it explicitly via the shard parameter")
    val shardCol = shard.getOrElse(
      if (numShards == 1) lit(0L)
      else pmod(hash(col(orderCol)), lit(numShards))).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // same partition+sort as the cumsum window → the guard costs no
    // extra exchange; cast(null-typed raise_error → long) keeps the
    // branch types aligned and the error in the plan
    val wSort = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(orderCol))
    val dupGuard = when(
      lag(col(orderCol), 1).over(wSort) === col(orderCol),
      raise_error(concat(
        lit(s"chunkConcatenated: duplicate $orderCol value within a " +
          "shard breaks offset determinism: "),
        col(orderCol).cast("string"))).cast("long"))
      .otherwise(lit(0L))
    docs
      .filter(col(tokenCol).isNotNull && col(tokenCol) > 0)
      .withColumn("shard", shardCol)
      .withColumn("__tok", col(tokenCol).cast("long"))
      .withColumn("__off",
        coalesce(sum(col("__tok")).over(w), lit(0L)) + dupGuard)
      // integer `div`, not `/`: double division would round token offsets
      // past 2^53 on a genuinely large stream
      .withColumn("seq_id", explode(sequence(
        expr(s"__off div $seqLen"),
        expr(s"(__off + __tok - 1) div $seqLen"))))
      .withColumn("piece_start",
        greatest(col("__off"), col("seq_id") * seqLen) - col("__off"))
      .withColumn("piece_len",
        least(col("__off") + col("__tok"), (col("seq_id") + 1) * seqLen) -
          greatest(col("__off"), col("seq_id") * seqLen))
      .drop("__off", "__tok")
  }

  /** Source-mixing resampler: downsample each source so the output
    * approximates the target mixture `weights` (e.g. 60% web, 30% books,
    * 10% code) without upsampling — the largest feasible corpus honoring
    * the ratios. Per-source Bernoulli rates are computed from one count
    * pass; sampling is seeded `sampleBy` (deterministic for a fixed input
    * layout). Sources absent from `weights` are dropped.
    */
  def mixSources(docs: DataFrame, sourceCol: String,
      weights: Map[String, Double], seed: Long = 42L): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    require(docs.schema(sourceCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"mixSources needs a string source column; '$sourceCol' is " +
        docs.schema(sourceCol).dataType.simpleString)
    val wSum = weights.values.sum
    val norm = weights.view.mapValues(_ / wSum).toMap
    // NULL-source rows have no stratum in the rates map and are dropped by
    // sampleBy, same as sources absent from `weights`.
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).alias("n"))
      .collect().filterNot(_.isNullAt(0))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Every weighted source must exist — silently shipping a corpus missing
    // a whole source would defeat the point of mixture control.
    val absent = norm.keys.filterNot(s => counts.getOrElse(s, 0L) > 0)
    require(absent.isEmpty,
      s"requested sources absent from the data: ${absent.mkString(", ")}")
    // Largest total T with T * norm(s) <= count(s) for every wanted source:
    val total = norm.map { case (s, w) => counts(s) / w }.min
    val rates = norm.map { case (s, w) =>
      s -> math.min(1.0, total * w / counts(s))
    }
    docs.stat.sampleBy(sourceCol, rates, seed)
  }

  /** Temperature-scaled mixture weights from the corpus's OWN source sizes:
    * `w_s ∝ n_s^alpha` — the standard multilingual/source-balancing recipe
    * (alpha = 1 reproduces natural proportions, alpha → 0 approaches
    * uniform; e.g. the α=0.3 exponent-smoothed sampling of multilingual
    * pretraining). One count pass (the same bounded driver map
    * [[mixSources]] already does), then the derived weights drive the same
    * no-upsample resampler.
    */
  def mixSourcesTemperature(docs: DataFrame, sourceCol: String,
      alpha: Double, seed: Long = 42L): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0,1]")
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).alias("n"))
      .collect().filterNot(_.isNullAt(0))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "no non-null sources present")
    val weights = counts.view.mapValues(n => math.pow(n.toDouble, alpha)).toMap
    mixSources(docs, sourceCol, weights, seed)
  }

  /** Gopher-style repetition signals (Rae et al. 2021, appendix A1.1 — the
    * MassiveText quality heuristics; public paper): per-document fractions
    * of duplicated lines and duplicated word n-grams. High values mark
    * boilerplate/spam for corpus filtering. Narrow per-row expressions —
    * codegen'd array ops, no shuffle, no UDFs.
    *
    * Adds `dup_line_frac` (1 − distinct/total over newline-split lines) and
    * `dup_2gram_frac` (same over adjacent word pairs); 0.0 for empty docs.
    */
  def repetitionSignals(docs: DataFrame, textCol: String = "text"): DataFrame = {
    def dupFrac(arr: Column): Column =
      TextFunctions.bindOnce(arr) { a =>
        when(size(a) <= 0, 0.0)
          .otherwise(round((size(a) - size(array_distinct(a))).cast("double") /
            size(a).cast("double"), 6))
      }
    val lines = filter(split(col(textCol), "\n"), l => length(trim(l)) > 0)
    val toks  = TextFunctions.tokens(col(textCol))
    val grams2 = TextFunctions.bindOnce(toks) { t =>
      when(size(t) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(t) - 2),
          i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2))))
    }
    docs
      .withColumn("dup_line_frac", dupFrac(lines))
      .withColumn("dup_2gram_frac", dupFrac(grams2))
  }

  /** Corpus term frequencies: explode tokens → count. Partial (map-side)
    * aggregation makes the shuffle carry one row per distinct term per
    * partition, not one per token occurrence.
    */
  def termFrequencies(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).alias("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term")
      .agg(count(lit(1)).alias("freq"))

  /** Document frequencies (documents containing the term) — the DF side of
    * TF-IDF. `array_distinct` before the explode keeps the shuffle at one row
    * per (doc, distinct term).
    */
  def documentFrequencies(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(array_distinct(TextFunctions.tokens(col(textCol)))).alias("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term")
      .agg(count(lit(1)).alias("doc_freq"))

  /** Overlapping token-window chunking — the document-splitting step in
    * front of embedding / retrieval / long-context training pipelines:
    * every document becomes strided windows of `chunkTokens` tokens, each
    * window sharing its first `overlapTokens` tokens with the previous
    * window's tail (so no boundary context is lost).
    *
    * Pure narrow operators: one tokenize, one `posexplode` over the strided
    * start sequence, one slice+join per chunk — no shuffle at all; at scale
    * this is a flat-map over the corpus scan. Output
    * (`idCol`, `chunk_id`, `chunk_text`, `n_tokens`), chunk_id 0-based and
    * contiguous per document; the final chunk may be shorter.
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String = "text",
      chunkTokens: Int = 512, overlapTokens: Int = 64): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      "overlapTokens must be in [0, chunkTokens)")
    val stride = chunkTokens - overlapTokens
    docs
      .withColumn("__t", TextFunctions.tokens(col(textCol)))
      .select(col(idCol), col("__t"),
        posexplode(sequence(lit(0), size(col("__t")) - 1, lit(stride)))
          .as(Seq("chunk_id", "__start")))
      .select(col(idCol), col("chunk_id").cast("long").alias("chunk_id"),
        concat_ws(" ", slice(col("__t"), col("__start") + 1, lit(chunkTokens)))
          .alias("chunk_text"),
        least(lit(chunkTokens), size(col("__t")) - col("__start"))
          .cast("long").alias("n_tokens"))
  }

  /** Per-document bigram-LM perplexity — the language-model quality signal
    * behind CCNet-style corpus filtering (Wenzek et al., "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data", 2020): train a
    * token-bigram model with add-one smoothing on `lmCorpus` (defaults to
    * `docs` itself), then score each document as
    * `exp(avg(-ln p(tok | prev)))` with
    * `p(tok|prev) = (c(prev,tok)+1) / (c(prev·)+V)`.
    *
    * Scale shape: the bigram expansion shuffles one row per token position,
    * but the LM aggregation is a partial+final hash agg, so the model table
    * is one row per DISTINCT bigram (vocabulary-sized, not corpus-sized);
    * prev-counts derive from the bigram counts without a second corpus pass;
    * the vocabulary size rides along as a broadcast one-row frame. Scoring
    * is a hash join of doc bigrams against the model — no driver loops, no
    * collects. Documents with fewer than two tokens have no bigrams and are
    * absent from the output.
    *
    * Returns (`idCol`, `n_bigrams`, `ppl`), lower ppl = more LM-like text.
    */
  def bigramPerplexity(docs: DataFrame, idCol: String, textCol: String = "text",
      lmCorpus: Option[DataFrame] = None): DataFrame = {
    def bigramsOf(df: DataFrame, cols: Column*): DataFrame = {
      // tokens must be a PROJECTED column before the transform lambda: an
      // inlined split() subtree inside the (interpreted) lambda would be
      // re-evaluated per element — an O(tokens²) regex split per document
      val t = col("__t")
      df.withColumn("__t", TextFunctions.tokens(col(textCol)))
        .select(cols :+ explode(when(size(t) < 2,
            array().cast("array<struct<prev:string,tok:string>>"))
          .otherwise(transform(sequence(lit(0), size(t) - 2),
            i => struct(element_at(t, i + 1).alias("prev"),
              element_at(t, i + 2).alias("tok"))))).alias("__b"): _*)
        .select(cols :+ col("__b.prev") :+ col("__b.tok"): _*)
    }
    val lmDocs = lmCorpus.getOrElse(docs)
    val bigramCounts = bigramsOf(lmDocs)
      .groupBy(col("prev"), col("tok")).agg(count(lit(1)).alias("__cbt"))
    val prevCounts = bigramCounts
      .groupBy(col("prev")).agg(sum(col("__cbt")).alias("__cp"))
    val vocab = lmDocs
      .select(explode(TextFunctions.tokens(col(textCol))).alias("__tok"))
      .agg(countDistinct(col("__tok")).alias("__v"))
    bigramsOf(docs, col(idCol))
      .join(bigramCounts, Seq("prev", "tok"), "left")
      .join(prevCounts, Seq("prev"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        (-log((coalesce(col("__cbt"), lit(0L)) + 1).cast("double") /
          (coalesce(col("__cp"), lit(0L)) + col("__v")).cast("double"))).alias("__nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).alias("n_bigrams"), exp(avg(col("__nll"))).alias("ppl"))
  }

  /** DSIR-style importance log-weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", arXiv:2302.03169):
    * rank raw-corpus documents by how target-like their hashed n-gram
    * profile is. Features are word uni+bigrams hashed into 256 buckets
    * (first two hex digits of md5 — replayable by any engine that prints
    * standard md5, which is what makes the whole weight oracle-checkable);
    * bucket distributions of the target and raw corpora get add-one
    * smoothing, and each document scores
    * `Σ_grams ln(p_target[b(g)] / p_raw[b(g)])` — the importance
    * log-likelihood ratio under bucketed unigram models. Resample with
    * weights ∝ exp(score) (or just top-k by score) to shift the corpus
    * toward the target domain.
    *
    * Scale shape: two stats passes are hash aggregates that PHYSICALLY
    * reduce to 256 rows each (map-side partials; the collect is 256
    * doubles), the per-bucket log-ratios ship to executors as a 256-slot
    * array literal indexed by `conv(hex, 16, 10)` — no join — and the
    * scoring pass is explode → per-doc sum, one map-side-combined shuffle
    * of (id, double) pairs. Nothing driver-side scales with the corpus.
    *
    * Returns (`idCol`, `n_grams`, `dsir_logweight`); higher = more
    * target-like. Documents with no tokens keep their row with weight 0.
    */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String = "text"): DataFrame = {
    val buckets = 256
    def grams(df: DataFrame, cols: Column*): DataFrame = {
      val t = col("__t")
      df.withColumn("__t",
          filter(TextFunctions.tokens(col(textCol)), x => length(x) > 0))
        .select(cols :+ explode(concat(t,
          when(size(t) < 2, array().cast("array<string>"))
            .otherwise(zip_with(
              slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
              (a, b) => concat(a, lit(" "), b))))).alias("__g"): _*)
    }
    val bucketOf: Column => Column = g => substring(md5(g), 1, 2)
    def bucketCounts(df: DataFrame): Map[Int, Long] = grams(df)
      .groupBy(bucketOf(col("__g")).alias("__b"))
      .agg(count(lit(1)).alias("__c"))
      .collect()
      .map(r => Integer.parseInt(r.getString(0), 16) -> r.getLong(1)).toMap
    val (tc, rc) = (bucketCounts(target), bucketCounts(raw))
    val (tn, rn) = (tc.values.sum.toDouble, rc.values.sum.toDouble)
    val lam = Array.tabulate(buckets) { b =>
      math.log((tc.getOrElse(b, 0L) + 1.0) / (tn + buckets)) -
        math.log((rc.getOrElse(b, 0L) + 1.0) / (rn + buckets))
    }
    val lamArr = array(lam.map(lit): _*)
    val scored = grams(raw, col(idCol))
      .select(col(idCol),
        element_at(lamArr, conv(bucketOf(col("__g")), 16, 10).cast("int") + 1)
          .alias("__lam"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).alias("n_grams"), sum(col("__lam")).alias("dsir_logweight"))
    raw.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).alias("n_grams"),
        coalesce(col("dsir_logweight"), lit(0.0)).alias("dsir_logweight"))
  }

  /** BM25 relevance of every document to a fixed bag of query terms — the
    * lexical-retrieval half of a RAG / hard-negative-mining pipeline
    * (Robertson & Zaragoza 2009; idf is the Lucene variant
    * `ln(1 + (N - df + 0.5)/(df + 0.5))`, always positive).
    *
    * Scale shape: the only exploded rows are matches of the ≤|q| query
    * terms (a codegen'd `isin` right after the explode, so the shuffle
    * carries query-term hits, not the corpus vocabulary); document lengths
    * come from `size(tokens)` without any explode; N and avgdl reduce to
    * one row; per-term df and idf ride a broadcast join keyed by the ≤|q|
    * terms. One (doc, term) hash agg + one per-doc sum.
    *
    * Returns (`idCol`, `n_hits`, `bm25`) for documents containing at least
    * one query term; `n_hits` = total query-term occurrences.
    */
  def bm25Scores(docs: DataFrame, idCol: String, queryTerms: Seq[String],
      textCol: String = "text", k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.map(_.toLowerCase).distinct.size == queryTerms.size,
      "queryTerms must be distinct (case-insensitive)")
    require(k1 >= 0 && b >= 0 && b <= 1, s"need k1 >= 0, b in [0,1]; got $k1 / $b")
    val terms = queryTerms.map(_.toLowerCase)
    val withLen = docs.select(col(idCol),
      size(filter(TextFunctions.tokens(col(textCol)), x => length(x) > 0))
        .cast("long").alias("__dl"))
    val corpus = withLen.agg(
      count(lit(1)).alias("__n"), avg(col("__dl")).alias("__avgdl"))
    val hits = docs
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).alias("__tok"))
      .filter(col("__tok").isInCollection(terms))
      .groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).alias("__tf"))
    val dfPerTerm = hits.groupBy(col("__tok"))
      .agg(countDistinct(col(idCol)).alias("__df"))
    hits
      .join(broadcast(dfPerTerm), Seq("__tok"))
      .join(withLen, Seq(idCol))
      .crossJoin(broadcast(corpus))
      .select(col(idCol), col("__tf"),
        (log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)) *
          (col("__tf") * (k1 + 1)) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
          .alias("__s"))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).alias("n_hits"), sum(col("__s")).alias("bm25"))
  }

  /** Token-blocklist screening — the C4 "bad words" filter (Raffel et al.
    * 2020 removed any page containing a blocklisted word; most modern
    * recipes soften that to a fraction threshold, so both knobs are
    * exposed). Matching is exact lowercase TOKEN equality — substring
    * matching is deliberately avoided (the classic "Scunthorpe" false
    * positive), and the blocklist compiles into one codegen'd `isin`
    * filter: narrow per-row work, no shuffle, no join, blocklist size
    * bounded by the literal list.
    *
    * Returns (`idCol`, `n_tokens`, `n_flagged`, `flagged_frac`, `blocked`)
    * where `blocked` = `n_flagged` ≥ `minHits` OR `flagged_frac` >
    * `maxFrac`. Null/empty text yields zeros and never blocks.
    */
  def blocklistTokenStats(docs: DataFrame, idCol: String, blocklist: Seq[String],
      textCol: String = "text", minHits: Long = 1L,
      maxFrac: Double = 1.0): DataFrame = {
    require(blocklist.nonEmpty, "blocklist must be non-empty")
    require(minHits >= 1, "minHits must be >= 1")
    val words = blocklist.map(_.toLowerCase).distinct
    val t = col("__t")
    docs
      // null text coalesces to "" BEFORE tokenizing: size(null array) is
      // null and would poison every downstream count
      .withColumn("__t",
        filter(TextFunctions.tokens(coalesce(col(textCol), lit(""))),
          x => length(x) > 0))
      .select(col(idCol),
        size(t).cast("long").alias("n_tokens"),
        size(filter(t, x => x.isInCollection(words))).cast("long").alias("n_flagged"))
      .withColumn("flagged_frac",
        when(col("n_tokens") > 0,
          col("n_flagged").cast("double") / col("n_tokens")).otherwise(lit(0.0)))
      .withColumn("blocked",
        col("n_flagged") >= minHits || col("flagged_frac") > maxFrac)
  }

  /** Per-stratum rank calibration of a quality score — maps each
    * document's raw score to its percent-rank WITHIN its source/language
    * stratum, so one global threshold means "top X% of every stratum"
    * rather than "top X% of whichever stratum happens to score high" (raw
    * quality signals are not comparable across domains: 'books' text
    * always out-scores 'web' text on stopword ratios, so a global cut
    * silently deletes whole sources).
    *
    * Executes as one hash-shuffle on the stratum key + per-stratum sort —
    * the window never spans strata, so there is no global sort; skew is
    * bounded by the largest stratum. Ties share a rank (SQL
    * `percent_rank` semantics), making the output engine-replayable.
    * Adds `calibrated` in [0, 1]; null scores sort first (lowest ranks),
    * matching SQL NULLS FIRST ascending defaults on both sides.
    */
  def calibrateByStratum(docs: DataFrame, strataCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.withColumn("calibrated",
      percent_rank().over(
        Window.partitionBy(col(strataCol)).orderBy(col(scoreCol))))
  }

  /** Unicode-script composition signals — the script-level complement to
    * n-gram language ID: fractions of a document's non-whitespace
    * characters in the Latin, Han, and Cyrillic scripts plus ASCII digits.
    * Catches what token models miss: mixed-script spam, mojibake,
    * wrong-script content inside a claimed language, and digit-dominated
    * pages. Pure narrow per-row regex counting (codegen'd, no shuffle, no
    * UDF); character counts are code points on both Spark and the SQL
    * oracle, so every fraction is value-checkable.
    *
    * Returns (`idCol`, `n_chars` non-whitespace, `latin_frac`, `han_frac`,
    * `cyrillic_frac`, `digit_frac`); fractions are 0 for empty/null text.
    */
  def scriptSignals(docs: DataFrame, idCol: String, textCol: String = "text"): DataFrame = {
    val nws = regexp_replace(coalesce(col(textCol), lit("")), "\\s", "")
    def cnt(cls: String) = length(regexp_replace(nws, s"[^$cls]", "")).cast("long")
    val n = length(nws).cast("long")
    def frac(c: Column) = when(n > 0, c.cast("double") / n).otherwise(lit(0.0))
    docs.select(col(idCol), n.alias("n_chars"),
      frac(cnt("\\p{IsLatin}")).alias("latin_frac"),
      frac(cnt("\\p{IsHan}")).alias("han_frac"),
      frac(cnt("\\p{IsCyrillic}")).alias("cyrillic_frac"),
      frac(cnt("0-9")).alias("digit_frac"))
  }
}
