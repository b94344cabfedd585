package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Persisted inverted index (postings lists) + BM25 served FROM the index —
  * the build-once / probe-many construction every lexical-retrieval system
  * uses at scale. [[TextAnalysis.bm25Scores]] recomputes corpus statistics
  * per query (one full corpus pass per probe); at 100 TB that pass IS the
  * cost, so the real pipeline materializes the index once and each query
  * touches only the ≤|q| queried terms' postings. No reference analog (the
  * reference is a tabular ETL); north-star retrieval surface shared with
  * [[Retrieval.rrfFuse]]'s lexical leg.
  *
  * Layout under `path` (each table published atomically via
  * [[graft.sinks.LakeSink.stageAndSwap]] — a crashed build leaves the
  * previous index version intact, never a half-written directory):
  *
  *   - `postings/`  (term, doc_id, tf)   — range-partitioned AND sorted by
  *     term, so a probe's `term IN (...)` predicate prunes both whole files
  *     (min/max footer envelopes) and row groups; the corpus-sized table is
  *     read ∝ the queried terms, not ∝ the vocabulary.
  *   - `termstats/` (term, df)           — one row per vocabulary term.
  *   - `doclen/`    (doc_id, dl)         — per-document token length.
  *   - `stats/`     (n, avgdl)           — one row.
  *
  * Scale shape of [[build]]: one tokenize pass feeds ONE (term, doc_id)
  * hash aggregation (map-side combined) — the only corpus shuffle; df and
  * the corpus scalars derive from the WRITTEN postings/doclen files (read
  * back, never recomputed), so the expensive tokenize runs exactly once.
  * Probe shape of [[bm25]]: postings filtered to the query terms (pushed
  * to the parquet scan), a broadcast of the ≤|q| term-stat rows, one join
  * against doclen on doc_id (AQE broadcasts the small hit side), one
  * per-doc sum. Nothing in the probe scales with vocabulary or corpus
  * size beyond the doclen join.
  */
object InvertedIndex {

  /** Tokenization shared with [[TextAnalysis.bm25Scores]]: whitespace
    * split, lowercased, empties dropped — index and direct scoring must
    * agree on terms or served scores drift from recomputed ones.
    */
  private def toks(c: org.apache.spark.sql.Column) =
    filter(TextFunctions.tokens(c), x => length(x) > 0)

  /** Build the index at `path` from `docs(idCol, textCol)`. */
  def build(docs: DataFrame, idCol: String, textCol: String, path: String,
      numPartitions: Int = 32): Unit = {
    val spark = docs.sparkSession
    val root  = new org.apache.hadoop.fs.Path(path)
    val fs    = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

    val tokenized = docs.select(col(idCol).alias("doc_id"),
      toks(col(textCol)).alias("__t"))

    graft.sinks.LakeSink.stageAndSwap(fs,
        new org.apache.hadoop.fs.Path(root, "doclen")) { staging =>
      tokenized.select(col("doc_id"), size(col("__t")).cast("long").alias("dl"))
        .write.mode("overwrite").parquet(staging.toString)
    }
    graft.sinks.LakeSink.stageAndSwap(fs,
        new org.apache.hadoop.fs.Path(root, "postings")) { staging =>
      tokenized.select(col("doc_id"), explode(col("__t")).alias("term"))
        .groupBy(col("term"), col("doc_id"))
        .agg(count(lit(1)).alias("tf"))
        // term-clustered files: range partitioner + in-file sort give every
        // file and row group a tight [min,max] term envelope for probe-time
        // pruning (same posture as Layout's Z-order writes, 1-D case)
        .repartitionByRange(numPartitions, col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(staging.toString)
    }
    // derive df and corpus scalars from the PUBLISHED files: zero re-tokenize
    val postings = spark.read.parquet(s"$path/postings")
    graft.sinks.LakeSink.stageAndSwap(fs,
        new org.apache.hadoop.fs.Path(root, "termstats")) { staging =>
      postings.groupBy(col("term"))
        .agg(count(lit(1)).alias("df")) // (term, doc_id) unique by construction
        .repartitionByRange(numPartitions, col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(staging.toString)
    }
    val doclen = spark.read.parquet(s"$path/doclen")
    graft.sinks.LakeSink.stageAndSwap(fs,
        new org.apache.hadoop.fs.Path(root, "stats")) { staging =>
      doclen.agg(count(lit(1)).alias("n"), avg(col("dl")).alias("avgdl"))
        .write.mode("overwrite").parquet(staging.toString)
    }
  }

  /** BM25 of every indexed document against `queryTerms`, served purely
    * from the index at `path` — same formula, parameters, and output shape
    * (`doc_id`, `n_hits`, `bm25`) as [[TextAnalysis.bm25Scores]], so served
    * and recomputed scores are interchangeable (q_bm25_indexed hash-checks
    * exactly that against the recompute oracle).
    */
  def bm25(spark: SparkSession, path: String, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.map(_.toLowerCase)
    val hits = spark.read.parquet(s"$path/postings")
      .filter(col("term").isInCollection(terms)) // pushed to the parquet scan
    val termstats = spark.read.parquet(s"$path/termstats")
      .filter(col("term").isInCollection(terms))
    val stats = spark.read.parquet(s"$path/stats")
    hits
      .join(broadcast(termstats), Seq("term"))
      .join(spark.read.parquet(s"$path/doclen"), Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("tf"),
        (log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .alias("__s"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).alias("n_hits"), sum(col("__s")).alias("bm25"))
  }
}
