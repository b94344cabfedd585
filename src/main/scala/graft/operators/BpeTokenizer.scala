package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** A real byte-pair-encoding tokenizer (Sennrich et al. 2016 — the public
  * subword recipe every LLM tokenizer descends from): merges are TRAINED
  * from corpus word frequencies and applied as greedy lowest-rank adjacent
  * merges within whitespace-delimited words.
  *
  * Scale split: training runs on the driver over a bounded word-frequency
  * sample (the frequency table of a few hundred thousand distinct words is
  * KBs–MBs — collecting it is the standard construction; merges are pure
  * data). Encoding is a narrow `mapPartitions` with the merge table in the
  * task closure and a per-partition WORD memo — corpora repeat words, so
  * amortized encode cost per token is a hash lookup, not a merge loop.
  * Determinism: ties in training break lexicographically, so the same
  * sample always yields the same merge table.
  */
object BpeTokenizer {

  type Merges = Map[(String, String), Int] // pair -> rank (lower = earlier)

  /** Word → symbol vector by Unicode CODE POINT (UTF-16 `map(_.toString)`
    * would split surrogate pairs — an emoji would become two lone
    * surrogates and mangle through UTF-8 row encoding).
    */
  private def symbols(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** One left-to-right sweep merging every adjacency of `pair` — shared by
    * training and encode so their segmentations can never drift.
    */
  private def mergeSweep(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train `numMerges` merges from a word-frequency table.
    *
    * INCREMENTAL pair maintenance (the construction in Sennrich's public
    * reference implementation): pair counts and a pair→words index are
    * built once; each merge round touches only the words that contain the
    * chosen pair, subtracting their old adjacencies and adding the new
    * ones. Per round the cost is the affected words' symbols plus one scan
    * of the pair table for the max — not a full recount of every word —
    * so training stays near-linear as numMerges grows into the thousands
    * on a large vocabulary. Merge choice (count desc, then lexicographic)
    * is unchanged, so the trained table is identical to the recount
    * implementation's.
    */
  def trainFromFrequencies(wordFreq: Map[String, Long], numMerges: Int): Merges = {
    require(numMerges > 0, "numMerges must be positive")
    import scala.collection.mutable
    // dedup identical symbol sequences (distinct words always are)
    val entries = wordFreq.toArray.map { case (w, n) => (symbols(w), n) }
    val syms    = entries.map(_._1)
    val freq    = entries.map(_._2)
    val pairCounts  = mutable.Map[(String, String), Long]()
    val pairToWords = mutable.Map[(String, String), mutable.BitSet]()
    def addWord(idx: Int, s: Vector[String], n: Long): Unit = {
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
        pairToWords.getOrElseUpdate(p, mutable.BitSet.empty) += idx
        i += 1
      }
    }
    def dropWord(s: Vector[String], n: Long): Unit = {
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val left = pairCounts(p) - n
        if (left == 0L) pairCounts.remove(p) else pairCounts(p) = left
        i += 1
      }
    }
    syms.indices.foreach(i => addWord(i, syms(i), freq(i)))
    val merges = Vector.newBuilder[(String, String)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // most frequent pair in ONE pass; lexicographic tie-break for
      // determinism (no full sort of the pair table)
      var best: ((String, String), Long) = (("", ""), -1L)
      pairCounts.foreach { case (p, n) =>
        val better = n > best._2 ||
          (n == best._2 && (p._1 < best._1._1 ||
            (p._1 == best._1._1 && p._2 < best._1._2)))
        if (better) best = (p, n)
      }
      if (best._2 < 2) done = true
      else {
        val pair = best._1
        merges += pair
        // the index may hold stale members (word rewritten since) — the
        // contains-check filters them; entries are delta-updated in place
        pairToWords.remove(pair).foreach(_.foreach { idx =>
          val s = syms(idx)
          var hit = false
          var i = 0
          while (!hit && i < s.length - 1) {
            hit = s(i) == pair._1 && s(i + 1) == pair._2; i += 1
          }
          if (hit) {
            dropWord(s, freq(idx))
            val merged = mergeSweep(s, pair)
            syms(idx) = merged
            addWord(idx, merged, freq(idx))
          }
        })
        rank += 1
      }
    }
    merges.result().zipWithIndex.toMap
  }

  /** Train from a corpus column: word frequencies aggregate DISTRIBUTED
    * (one shuffle of distinct words), then the top `maxVocabWords` most
    * frequent words — the statistical mass that determines merges — collect
    * to the driver for the merge loop.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Int = 1 << 17): Merges = {
    val freqs = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).alias("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).alias("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxVocabWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    trainFromFrequencies(freqs, numMerges)
  }

  /** Greedy encode of one word: repeatedly apply the lowest-rank adjacent
    * merge until none applies. Concatenating the result always restores the
    * word exactly (merges only ever join adjacent symbols).
    */
  def encodeWord(word: String, merges: Merges): Seq[String] = {
    var syms: Vector[String] = symbols(word)
    var continue = syms.length >= 2
    while (continue) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = merges.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val pair = merges.collectFirst {
          case (p, r) if r == bestRank => p }.get
        syms = mergeSweep(syms, pair)
        continue = syms.length >= 2
      }
    }
    syms
  }

  /** Adds `bpe_tokens` (flat subword array) and `n_subwords` per document.
    * Narrow mapPartitions; a per-partition word memo amortizes repeated
    * words to a map hit.
    */
  def encode(docs: DataFrame, textCol: String, merges: Merges): DataFrame = {
    val outSchema = docs.schema
      .add("bpe_tokens", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))
      .add("n_subwords", org.apache.spark.sql.types.LongType)
    val encoder = Encoders.row(outSchema)
    val textIdx = docs.schema.fieldIndex(textCol)
    docs.mapPartitions { rows =>
      val memo = scala.collection.mutable.HashMap[String, Seq[String]]()
      rows.map { row =>
        val text = row.getString(textIdx)
        val tokens: Seq[String] =
          if (text == null) Seq.empty
          else text.split("\\s+").toSeq.filter(_.nonEmpty)
            .flatMap(w => memo.getOrElseUpdate(w, encodeWord(w, merges)))
        Row.fromSeq(row.toSeq :+ tokens :+ tokens.length.toLong)
      }
    }(encoder)
  }
}
