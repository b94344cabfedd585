package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.functions.TextFunctions
import graft.sinks.LakeSink

/** Persisted inverted index (postings lists) + BM25 served FROM the index —
  * the build-once / probe-many construction every lexical-retrieval system
  * uses at scale. [[TextAnalysis.bm25Scores]] recomputes corpus statistics
  * per query (one full corpus pass per probe); at 100 TB that pass IS the
  * cost, so the real pipeline materializes the index once, [[append]]s each
  * delivery's delta, and each query touches only the ≤|q| queried terms'
  * postings. No reference analog (the reference is a tabular ETL);
  * north-star retrieval surface shared with [[Retrieval.rrfFuse]]'s
  * lexical leg.
  *
  * Layout under `path` — every table is partitioned by an integer
  * `delivery` column (one subdirectory per ingested batch):
  *
  *   - `postings/delivery=k/`  (term, doc_id, tf) — each delivery's files
  *     are range-partitioned AND sorted by term, so a probe's
  *     `term IN (...)` predicate prunes whole files (min/max footer
  *     envelopes) and row groups; the corpus-sized table is read ∝ the
  *     queried terms, not ∝ the vocabulary.
  *   - `termstats/delivery=k/` (term, df) — PARTIAL document frequencies;
  *     probes sum them per queried term, so appends never rewrite history.
  *   - `doclen/delivery=k/`    (doc_id, dl).
  *   - `stats/delivery=k/`     (n, sum_dl) — mergeable partials (counts and
  *     token totals are exact longs, so the served avgdl = Σsum_dl / Σn is
  *     bit-identical to a from-scratch recompute).
  *
  * '''Commit protocol.''' A delivery k becomes visible only when the empty
  * marker file `_deliveries/k` exists; the marker is created LAST, after
  * all four `delivery=k` directories have landed (each via an atomic
  * staging rename). Probes filter every table to the marked deliveries
  * (partition pruning skips unmarked directories entirely), so a crash
  * mid-append leaves invisible orphan directories, never a torn index; the
  * next [[append]] reuses the orphaned id and its stage-and-swap replaces
  * the leftovers. [[compact]] is crash-safe by the same argument: the
  * merged `delivery=0` replaces each TABLE root wholesale (so a table is
  * either fully compacted or untouched — in both states the marked-filter
  * read sees exactly the full content), and surplus markers are dropped
  * only at the end.
  *
  * Scale shape of [[build]]: one tokenize pass feeds ONE (term, doc_id)
  * hash aggregation (map-side combined) — the only corpus shuffle; df and
  * the corpus scalars derive from the WRITTEN postings/doclen files (read
  * back, never recomputed), so the expensive tokenize runs exactly once.
  * [[append]] costs one tokenize+aggregate over the DELTA plus an id
  * anti-join against doclen (16-byte rows); history is never re-read.
  * Probe shape of [[bm25]]: postings filtered to the query terms (pushed
  * to the parquet scan), a broadcast of the ≤|q|·deliveries partial
  * term-stat rows, one join against doclen on doc_id (AQE broadcasts the
  * small hit side), one per-doc sum. Nothing in the probe scales with
  * vocabulary or corpus size beyond the doclen join; probe fan-in grows
  * with the delivery count until [[compact]] folds it back to one.
  */
object InvertedIndex {

  /** Tokenization shared with [[TextAnalysis.bm25Scores]]: whitespace
    * split, lowercased, empties dropped — index and direct scoring must
    * agree on terms or served scores drift from recomputed ones.
    */
  private def toks(c: org.apache.spark.sql.Column) =
    filter(TextFunctions.tokens(c), x => length(x) > 0)

  private def hfs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Marked (visible) delivery ids, ascending; empty when uninitialized. */
  private[graft] def deliveries(fs: FileSystem, path: String): Seq[Int] = {
    val d = new Path(path, "_deliveries")
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).iterator.map(_.getPath.getName)
      .collect { case s if s.nonEmpty && s.forall(_.isDigit) => s.toInt }
      .toSeq.sorted
  }

  private def mark(fs: FileSystem, path: String, k: Int): Unit = {
    val d = new Path(path, "_deliveries")
    if (!fs.exists(d)) fs.mkdirs(d)
    fs.create(new Path(d, k.toString), true).close()
  }

  private val tables = Seq("postings", "termstats", "doclen", "stats")

  /** Read one index table restricted to the marked deliveries — unmarked
    * (crash-orphan) partition directories are pruned at planning time.
    */
  private def readTable(spark: SparkSession, path: String, name: String,
      marked: Seq[Int]): DataFrame =
    spark.read.parquet(s"$path/$name")
      .filter(col("delivery").isInCollection(marked))

  /** Write one delivery's four table partitions from a tokenized delta,
    * then publish the marker. `tokenized` must be (doc_id, __t).
    */
  private def writeDelivery(spark: SparkSession, path: String, k: Int,
      tokenizedIn: DataFrame, numPartitions: Int,
      positional: Boolean = false): Unit = {
    val fs = hfs(spark, path)
    // one tokenize pass per delivery: doclen and postings both consume the
    // materialized frame (MEMORY_AND_DISK semantics — at corpus-scale
    // deltas this spills rather than recomputing the tokenize twice)
    val tokenized = tokenizedIn.localCheckpoint()
    LakeSink.stageAndSwap(fs, new Path(path, s"doclen/delivery=$k")) { st =>
      tokenized.select(col("doc_id"), size(col("__t")).cast("long").alias("dl"))
        .write.mode("overwrite").parquet(st.toString)
    }
    LakeSink.stageAndSwap(fs, new Path(path, s"postings/delivery=$k")) { st =>
      // positional postings add a sorted 0-based position array per
      // (term, doc) — the phrase/proximity-query payload. tf stays a
      // separate long so BM25 probes never deserialize the arrays
      // (parquet column pruning drops `pos` unless a probe asks for it).
      val rows =
        if (!positional)
          tokenized.select(col("doc_id"), explode(col("__t")).alias("term"))
            .groupBy(col("term"), col("doc_id"))
            .agg(count(lit(1)).alias("tf"))
        else
          tokenized.select(col("doc_id"),
              posexplode(col("__t")).as(Seq("__p", "term")))
            .groupBy(col("term"), col("doc_id"))
            .agg(count(lit(1)).alias("tf"),
              sort_array(collect_list(col("__p").cast("int"))).alias("pos"))
      // term-clustered files: range partitioner + in-file sort give every
      // file and row group a tight [min,max] term envelope for probe-time
      // pruning (same posture as Layout's Z-order writes, 1-D case)
      rows.repartitionByRange(numPartitions, col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(st.toString)
    }
    // derive df and the corpus scalars from the PUBLISHED delta files:
    // zero re-tokenize, and the stats can never disagree with the postings
    val postings = spark.read.parquet(s"$path/postings/delivery=$k")
    LakeSink.stageAndSwap(fs, new Path(path, s"termstats/delivery=$k")) { st =>
      postings.groupBy(col("term"))
        .agg(count(lit(1)).alias("df")) // (term, doc_id) unique by construction
        .repartitionByRange(numPartitions, col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(st.toString)
    }
    val doclen = spark.read.parquet(s"$path/doclen/delivery=$k")
    LakeSink.stageAndSwap(fs, new Path(path, s"stats/delivery=$k")) { st =>
      doclen.agg(count(lit(1)).alias("n"),
          coalesce(sum(col("dl")), lit(0L)).alias("sum_dl"))
        .write.mode("overwrite").parquet(st.toString)
    }
    tokenized.unpersist(blocking = false)
    mark(fs, path, k) // the commit point: delivery k is now visible
  }

  /** (Re)build the index at `path` from `docs(idCol, textCol)` as a single
    * delivery 0; any previous index state at `path` is superseded (stale
    * delivery directories are removed, then the marker set is reset).
    */
  def build(docs: DataFrame, idCol: String, textCol: String, path: String,
      numPartitions: Int = 32, positional: Boolean = false): Unit = {
    val spark = docs.sparkSession
    val fs = hfs(spark, path)
    fs.delete(new Path(path, "_deliveries"), true) // hide any prior state
    tables.foreach(t => fs.delete(new Path(path, t), true))
    val tokenized = docs.select(col(idCol).alias("doc_id"),
      toks(col(textCol)).alias("__t"))
    writeDelivery(spark, path, 0, tokenized, numPartitions, positional)
  }

  /** Append one delivery of new documents. Docs whose ids are already
    * indexed are skipped (re-delivery of the same batch is idempotent);
    * only the delta is tokenized. A crash before the marker lands leaves
    * the delivery invisible, and the retry reuses its id.
    */
  def append(docs: DataFrame, idCol: String, textCol: String, path: String,
      numPartitions: Int = 8): Unit = {
    val spark = docs.sparkSession
    val fs = hfs(spark, path)
    val marked = deliveries(fs, path)
    require(marked.nonEmpty, s"append: no index at $path — run build first")
    val seen = readTable(spark, path, "doclen", marked).select(col("doc_id"))
    val fresh = docs.select(col(idCol).alias("doc_id"),
        toks(col(textCol)).alias("__t"))
      .join(seen, Seq("doc_id"), "left_anti")
    // an index is positional iff its existing postings carry `pos` —
    // appends inherit the build's choice, never fork the schema
    val positional = spark.read.parquet(s"$path/postings")
      .columns.contains("pos")
    writeDelivery(spark, path, marked.max + 1, fresh, numPartitions, positional)
  }

  /** Fold all marked deliveries into a single `delivery=0` per table,
    * bounding probe fan-in and file counts after many appends. Each table
    * root is replaced wholesale by its merged single-delivery layout (an
    * interrupted compaction leaves every table either fully compacted or
    * untouched — both read correctly under the marker filter because the
    * merged delivery 0 carries the full content); surplus markers are
    * dropped last. Served scores are identical before and after: postings
    * rows are unioned unchanged, and df / n / sum_dl partials sum to the
    * same exact longs.
    */
  def compact(spark: SparkSession, path: String, numPartitions: Int = 32): Unit = {
    val fs = hfs(spark, path)
    val marked = deliveries(fs, path)
    require(marked.nonEmpty, s"compact: no index at $path")
    if (marked == Seq(0)) return // already a single delivery
    def merged(name: String) = readTable(spark, path, name, marked).drop("delivery")
    def swapTable(name: String)(write: (DataFrame, Path) => Unit): Unit = {
      // materialize the merge BEFORE swapping: the staging write must not
      // read the directory it is about to replace while it is mid-rename
      val rows = merged(name).localCheckpoint()
      LakeSink.stageAndSwap(fs, new Path(path, name)) { st =>
        write(rows, new Path(st, "delivery=0"))
      }
    }
    swapTable("postings") { (df, dst) =>
      df.repartitionByRange(numPartitions, col("term"))
        .sortWithinPartitions("term").write.mode("overwrite").parquet(dst.toString)
    }
    swapTable("termstats") { (df, dst) =>
      df.groupBy(col("term")).agg(sum(col("df")).alias("df"))
        .repartitionByRange(numPartitions, col("term"))
        .sortWithinPartitions("term").write.mode("overwrite").parquet(dst.toString)
    }
    swapTable("doclen") { (df, dst) =>
      df.write.mode("overwrite").parquet(dst.toString)
    }
    swapTable("stats") { (df, dst) =>
      df.agg(coalesce(sum(col("n")), lit(0L)).alias("n"),
          coalesce(sum(col("sum_dl")), lit(0L)).alias("sum_dl"))
        .write.mode("overwrite").parquet(dst.toString)
    }
    marked.filter(_ != 0).foreach(k =>
      fs.delete(new Path(path, s"_deliveries/$k"), false))
    mark(fs, path, 0)
  }

  /** BM25 of every indexed document against `queryTerms`, served purely
    * from the index at `path` — same formula, parameters, and output shape
    * (`doc_id`, `n_hits`, `bm25`) as [[TextAnalysis.bm25Scores]], so served
    * and recomputed scores are interchangeable (q_bm25_indexed and
    * q_bm25_index_append hash-check exactly that against the recompute
    * oracle, the latter across a build + two appends).
    */
  def bm25(spark: SparkSession, path: String, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val fs = hfs(spark, path)
    val marked = deliveries(fs, path)
    require(marked.nonEmpty, s"bm25: no index at $path")
    val terms = queryTerms.map(_.toLowerCase)
    val hits = readTable(spark, path, "postings", marked)
      .filter(col("term").isInCollection(terms)) // pushed to the parquet scan
    // partial df rows: ≤ |q| · deliveries of them — sum per term, broadcast
    val termstats = readTable(spark, path, "termstats", marked)
      .filter(col("term").isInCollection(terms))
      .groupBy(col("term")).agg(sum(col("df")).alias("df"))
    // exact-long partials: Σn and Σsum_dl merge associatively, so the
    // served avgdl is bit-identical however the corpus was delivered
    val stats = readTable(spark, path, "stats", marked)
      .agg(sum(col("n")).alias("n"), sum(col("sum_dl")).alias("sum_dl"))
      .select(col("n"), (col("sum_dl").cast("double") / col("n")).alias("avgdl"))
    hits
      .join(broadcast(termstats), Seq("term"))
      .join(readTable(spark, path, "doclen", marked).select("doc_id", "dl"),
        Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("tf"),
        (log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .alias("__s"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).alias("n_hits"), sum(col("__s")).alias("bm25"))
  }

  /** Exact PHRASE occurrences per document, served from a positional index
    * (`build(..., positional = true)`): document d matches at start p iff
    * term_i sits at position p+i for every i. Each term's postings row
    * carries its sorted position array; leg i shifts its positions by −i
    * and the chained `array_intersect` leaves exactly the valid starts —
    * per-document work is O(Σ positions), no token re-scan of any text.
    *
    * Scale shape: the scan reads ONLY the phrase terms' postings (term
    * range-clustered files, predicate pushed), the n-way doc_id equi-join
    * joins hit-lists whose size is the terms' document frequency — AQE
    * broadcasts the rarest leg — and nothing scales with corpus size or
    * vocabulary. Repeated terms in the phrase are handled naturally (the
    * same postings row enters twice under different shifts). A doc is
    * indexed by exactly one delivery ([[append]]'s anti-join), so legs
    * never need cross-delivery position merges.
    *
    * Output: (`doc_id`, `n_occurrences` > 0).
    */
  def phraseCount(spark: SparkSession, path: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val fs = hfs(spark, path)
    val marked = deliveries(fs, path)
    require(marked.nonEmpty, s"phraseCount: no index at $path")
    val terms = phrase.map(_.toLowerCase)
    val posts = readTable(spark, path, "postings", marked)
    require(posts.columns.contains("pos"),
      s"index at $path is not positional — build(positional = true)")
    val hits = posts.filter(col("term").isInCollection(terms.distinct))
    val legs = terms.zipWithIndex.map { case (t, i) =>
      hits.filter(col("term") === t)
        .select(col("doc_id"),
          (if (i == 0) col("pos")
           else transform(col("pos"), p => p - i)).alias(s"__pos$i"))
    }
    legs.reduce((a, b) => a.join(b, Seq("doc_id")))
      .select(col("doc_id"),
        size(legs.indices.tail.foldLeft(col("__pos0"))((acc, i) =>
          array_intersect(acc, col(s"__pos$i")))).cast("long")
          .alias("n_occurrences"))
      .filter(col("n_occurrences") > 0)
  }

  /** Unordered proximity (NEAR/w) from the positional index: documents
    * where `termA` has an occurrence within `window` tokens of `termB`,
    * with `n_near` = how many of A's occurrences have such a neighbor.
    * Same probe shape as [[phraseCount]] (two postings legs, one doc_id
    * equi-join); the per-document pair scan is O(tf_A · tf_B) inside a
    * codegen'd `exists` lambda — bounded by term frequency, independent
    * of corpus size.
    */
  def proximityCount(spark: SparkSession, path: String, termA: String,
      termB: String, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val fs = hfs(spark, path)
    val marked = deliveries(fs, path)
    require(marked.nonEmpty, s"proximityCount: no index at $path")
    val posts = readTable(spark, path, "postings", marked)
    require(posts.columns.contains("pos"),
      s"index at $path is not positional — build(positional = true)")
    def leg(t: String, alias: String) =
      posts.filter(col("term") === t.toLowerCase)
        .select(col("doc_id"), col("pos").alias(alias))
    leg(termA, "__pa").join(leg(termB, "__pb"), Seq("doc_id"))
      .select(col("doc_id"),
        size(filter(col("__pa"), p =>
          exists(col("__pb"), q => abs(q - p) <= window))).cast("long")
          .alias("n_near"))
      .filter(col("n_near") > 0)
  }
}
