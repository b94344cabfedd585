package graft

import graft.operators.BpeTokenizer
import org.apache.spark.sql.functions._

class BpeTokenizerSpec extends SparkTestBase {
  import spark.implicits._

  test("training learns the most frequent pairs first, deterministically") {
    val freq = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = BpeTokenizer.trainFromFrequencies(freq, numMerges = 4)
    merges should not be empty
    // 'es'(9) and 'st'(9) dominate ('es' wins the tie lexicographically),
    // then 'est' as a unit (9), then 'lo' (7)
    val byRank = merges.toSeq.sortBy(_._2).map(_._1)
    byRank.head shouldBe (("e", "s"))
    byRank(1) shouldBe (("es", "t"))
    // identical input yields identical merges
    BpeTokenizer.trainFromFrequencies(freq, 4) shouldBe merges
  }

  test("incremental pair maintenance equals a full-recount reference") {
    // naive reference: recount every pair from scratch each round (the
    // O(merges × corpus) construction the incremental index replaces)
    def sweep(s: Vector[String], p: (String, String)): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i < s.length - 1 && s(i) == p._1 && s(i + 1) == p._2) {
          out += s(i) + s(i + 1); i += 2
        } else { out += s(i); i += 1 }
      }
      out.result()
    }
    def reference(freq: Map[String, Long], numMerges: Int): Map[(String, String), Int] = {
      var words = freq.map { case (w, n) => w.map(_.toString).toVector -> n }
      val merges = Vector.newBuilder[(String, String)]
      var done = false
      var rank = 0
      while (rank < numMerges && !done) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        words.foreach { case (s, n) =>
          s.indices.dropRight(1).foreach { i =>
            counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + n
          }
        }
        val best = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.headOption
        best match {
          case Some((p, n)) if n >= 2 =>
            merges += p
            words = words.map { case (s, m) => sweep(s, p) -> m }
            rank += 1
          case _ => done = true
        }
      }
      merges.result().zipWithIndex.toMap
    }

    val rnd = new scala.util.Random(7)
    val freq = (1 to 400).map { _ =>
      val w = (1 to 3 + rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
      w -> (1L + rnd.nextInt(50))
    }.toMap
    BpeTokenizer.trainFromFrequencies(freq, numMerges = 120) shouldBe
      reference(freq, 120)
  }

  test("encode applies merges greedily by rank and always reconstructs") {
    val merges = Map(("e", "s") -> 0, ("es", "t") -> 1, ("l", "o") -> 2)
    BpeTokenizer.encodeWord("newest", merges) shouldBe Seq("n", "e", "w", "est")
    BpeTokenizer.encodeWord("lowest", merges) shouldBe Seq("lo", "w", "est")
    BpeTokenizer.encodeWord("xyz", merges) shouldBe Seq("x", "y", "z")
    BpeTokenizer.encodeWord("a", merges) shouldBe Seq("a")
    // reconstruction invariant on arbitrary words — including non-BMP
    // characters (surrogate pairs must stay paired in one symbol)
    Seq("estestest", "ssss", "toes", "caf\u00e9", "a\ud83d\ude00b").foreach { w =>
      val toks = BpeTokenizer.encodeWord(w, merges)
      toks.mkString("") shouldBe w
      toks.foreach(t => Character.isLowSurrogate(t.charAt(0)) shouldBe false)
    }
  }

  test("corpus-trained encode compresses and reconstructs the documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val merges = BpeTokenizer.train(docs, "text", numMerges = 100)
    // training stops early when no pair repeats — on the tiny sf0.001
    // corpus that lands under the cap; it must still learn a useful table
    merges.size should (be > 50 and be <= 100)

    val out = BpeTokenizer.encode(docs, "text", merges)
      .select($"doc_id", $"text", $"bpe_tokens", $"n_subwords")
    val rows = out.collect()
    rows.length.toLong shouldBe docs.count()
    rows.foreach { r =>
      val squashed = r.getString(1).replaceAll("\\s+", "")
      val joined = r.getSeq[String](2).mkString("")
      joined shouldBe squashed
      // merges learned on this corpus must compress: fewer subwords than chars
      if (squashed.length > 10)
        r.getLong(3) should be < squashed.length.toLong
    }
  }
}
