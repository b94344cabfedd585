package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis kernels (north-star text ops over `documents.parquet`).
  *
  * Everything expressible with `org.apache.spark.sql.functions` built-ins
  * stays a built-in composition (codegen'd, pushdown-friendly); only the two
  * genuinely scalar-custom ops — 64-bit SimHash and a polynomial rolling-hash
  * fingerprint — are native Catalyst expressions whose `doGenCode` calls a
  * static JVM kernel, keeping whole-stage codegen intact.
  */
object TextKernels {

  /** FNV-1a 64-bit over UTF-8 bytes — stable token hash, no allocation. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash of a token array: per-bit majority vote of token hashes.
    * Near-duplicate texts land within a small Hamming distance.
    */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Polynomial rolling hash (base-31 mod 2^64) over the whole string —
    * a deterministic document fingerprint cheaper than a cryptographic hash.
    */
  def rollingHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Distinct murmur3(seed=42) hashes of the word-`n` shingles of a token
    * array, in one pass — value-identical to
    * `array_distinct(transform(shingles(toks, n), s => hash(s)))` (Spark's
    * `hash` is murmur3 seed 42 over the UTF-8 bytes) while avoiding four
    * interpreted higher-order traversals per row. If fewer than `n` tokens,
    * the single shingle is all tokens space-joined (same as `shingles`).
    */
  def hashedShingles(toks: ArrayData, n: Int): ArrayData = {
    val m    = toks.numElements()
    val sep  = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[Integer]
    def hashOf(parts: Array[UTF8String]): Int = {
      val s = UTF8String.concatWs(sep, parts: _*)
      org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
    }
    def tokenAt(i: Int): UTF8String =
      if (toks.isNullAt(i)) null else toks.getUTF8String(i)
    if (m < n) {
      val parts = Array.tabulate(m)(tokenAt)
      seen.add(hashOf(parts))
    } else {
      var i = 0
      while (i + n <= m) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = tokenAt(i + j); j += 1 }
        seen.add(hashOf(parts))
        i += 1
      }
    }
    val out = new Array[Int](seen.size)
    val it  = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Distinct xxhash64(seed=42) hashes of the word-`n` shingles — the
    * 64-bit sibling of [[hashedShingles]] for corpus-scale gram statistics,
    * where the 32-bit space would collide from ~77k distinct grams
    * (birthday bound) and a 100 TB corpus carries billions. Unlike the
    * 32-bit variant, a document with fewer than `n` tokens yields an EMPTY
    * array rather than a whole-doc shingle: repeated-passage evidence
    * requires a full n-gram.
    */
  def hashedShingles64(toks: ArrayData, n: Int): ArrayData = {
    val m    = toks.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    if (m >= n) {
      val sep = UTF8String.fromString(" ")
      var i = 0
      while (i + n <= m) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) {
          parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
          j += 1
        }
        val s = UTF8String.concatWs(sep, parts: _*)
        seen.add(org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L))
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it  = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** POSITIONAL xxhash64 gram hashes: one hash per start position, in token
    * order, duplicates kept — the per-occurrence view that exact-substring
    * dedup needs (the distinct-set variant [[hashedShingles64]] cannot say
    * WHERE a duplicated gram sits). Docs shorter than `n` yield an empty
    * array.
    */
  def positionalShingles64(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    val count = if (m >= n) m - n + 1 else 0
    val out = new Array[Long](count)
    if (count > 0) {
      val sep = UTF8String.fromString(" ")
      var i = 0
      while (i < count) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) {
          parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
          j += 1
        }
        val s = UTF8String.concatWs(sep, parts: _*)
        out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Rebuild a token stream with every token covered by a duplicated-gram
    * start removed: `starts` is a SORTED array of gram start positions, each
    * covering `[s, s+n)`. One merged interval sweep — O(tokens + starts),
    * independent of how much the spans overlap (a duplicated passage of
    * length P contributes P−n+1 overlapping starts).
    */
  def dropCoveredTokens(toks: ArrayData, starts: ArrayData, n: Int): UTF8String = {
    val m = toks.numElements()
    val k = starts.numElements()
    val kept = new scala.collection.mutable.ArrayBuffer[UTF8String](m)
    var s = 0
    var coveredUntil = -1 // exclusive
    var i = 0
    while (i < m) {
      while (s < k && starts.getInt(s) <= i) {
        val end = starts.getInt(s) + n
        if (end > coveredUntil) coveredUntil = end
        s += 1
      }
      if (i >= coveredUntil && !toks.isNullAt(i)) kept += toks.getUTF8String(i)
      i += 1
    }
    UTF8String.concatWs(UTF8String.fromString(" "), kept.toSeq: _*)
  }

  /** Deflate compression ratio (compressed bytes / raw bytes) — the
    * compressibility quality signal used by web-corpus filters (highly
    * repetitive spam compresses far below natural prose; near-random noise
    * doesn't compress at all). Raw DEFLATE stream (nowrap), default level;
    * empty text rates a neutral 1.0.
    */
  def deflateRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }

  /** For each of `sets`, the count of tokens present in it — ONE pass over
    * the token array with hash-set membership, replacing the interpreted
    * `size(filter(toks, t => array_contains(profile, t)))` per set (an
    * interpreted lambda × tokens × sets × set-size string compares).
    */
  def tokenSetCounts(toks: ArrayData,
      sets: Array[java.util.HashSet[UTF8String]]): ArrayData = {
    val out = new Array[Int](sets.length)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var j = 0
        while (j < sets.length) {
          if (sets(j).contains(t)) out(j) += 1
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** All `numHashes` MinHash minima of an int-array in one pass; seeded
    * murmur3 per element matches Spark's `hash(int, seed)`. An empty input
    * yields a signature of Int.MaxValue sentinels.
    */
  def minhashSignature(sh: ArrayData, numHashes: Int): ArrayData = {
    val out = new Array[Int](numHashes)
    java.util.Arrays.fill(out, Int.MaxValue)
    val n = sh.numElements()
    var j = 0
    while (j < n) {
      if (!sh.isNullAt(j)) {
        val v = sh.getInt(j)
        var i = 0
        while (i < numHashes) {
          val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(v, i)
          if (h < out(i)) out(i) = h
          i += 1
        }
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `simhash64(tokens)` over an `array<string>` column. */
case class SimHash64(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullSafeEval(in: Any): Any =
    TextKernels.simhash64(in.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `hashed_shingles(tokens, n)` — distinct murmur3 hashes of word-n-gram
  * shingles in one codegen'd pass (see [[TextKernels.hashedShingles]]).
  * Keeping this a native expression (rather than a transform/array_distinct
  * composition) keeps the dedup pipelines inside whole-stage codegen.
  */
case class HashedShingles(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(in: Any): Any =
    TextKernels.hashedShingles(in.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.hashedShingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `token_set_counts(tokens)` — per-set membership counts in one codegen'd
  * pass (see [[TextKernels.tokenSetCounts]]). The sets are baked into the
  * expression instance and shipped as a task-closure reference object.
  */
case class TokenSetCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression with Serializable {
  @transient private lazy val utf8Sets: Array[java.util.HashSet[UTF8String]] =
    sets.map { words =>
      val s = new java.util.HashSet[UTF8String](words.length * 2)
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(in: Any): Any =
    TextKernels.tokenSetCounts(in.asInstanceOf[ArrayData], utf8Sets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("tokenSets", utf8Sets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.tokenSetCounts($c, $setsRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `hashed_shingles64(tokens, n)` — distinct xxhash64 hashes of word-n-gram
  * shingles in one codegen'd pass (see [[TextKernels.hashedShingles64]]).
  * Empty output for documents shorter than `n` tokens.
  */
case class HashedShingles64(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(in: Any): Any =
    TextKernels.hashedShingles64(in.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.hashedShingles64($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `positional_shingles64(tokens)` — per-start-position xxhash64 gram hashes
  * (order kept, duplicates kept) for exact-substring dedup.
  */
case class PositionalShingles64(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(in: Any): Any =
    TextKernels.positionalShingles64(in.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.positionalShingles64($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `drop_covered_tokens(tokens, starts)` — token stream minus every token
  * covered by `[s, s+n)` for the sorted duplicated-gram starts `s`, joined
  * by single spaces. Codegen'd interval sweep.
  */
case class DropCoveredTokens(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def nullSafeEval(toks: Any, starts: Any): Any =
    TextKernels.dropCoveredTokens(toks.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = graft.functions.TextKernels.dropCoveredTokens($t, $s, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `minhash_sig(hashed_shingles, k)` — all `k` MinHash minima in ONE pass
  * over the shingle-hash array. Seeded murmur3 per element matches
  * `functions.hash(col, seed)` on ints, so the signature equals the
  * `array((0 until k).map(i => array_min(transform(sh, s => hash(s, i)))))`
  * composition while doing k·n integer hashes instead of k interpreted
  * array traversals (higher-order functions don't codegen).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(in: Any): Any =
    TextKernels.minhashSignature(in.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.minhashSignature($c, $numHashes)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `deflate_ratio(text)` — compressed/raw byte ratio (DEFLATE, nowrap). */
case class DeflateRatio(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(in: Any): Any =
    TextKernels.deflateRatio(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.deflateRatio($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `rolling_hash(text)` — 64-bit polynomial fingerprint of a string column. */
case class RollingHash(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullSafeEval(in: Any): Any =
    TextKernels.rollingHash(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.rollingHash($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextFunctions {

  /** Let-binding for column expressions: evaluates `c` ONCE per row and binds
    * it to a lambda variable inside `f`. Composite expressions built from
    * higher-order functions run interpreted (no whole-stage codegen, so no
    * common-subexpression elimination); without this, an expression like
    * `transform(seq, i => slice(toks, i, n))` re-evaluates the full `toks`
    * subtree — a regex split — once per element instead of once per row.
    */
  def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Token count without materializing the token array downstream. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word pieces plus punctuation/digit runs —
    * a regex approximation of byte-pair tokenizer output length.
    */
  def approxBpeTokenCount(text: Column): Column =
    size(filter(split(lower(text), "(?=[^a-z0-9])|(?<=[^a-z0-9])"), t => length(t) > 0))

  /** Word n-gram shingles of the token array (for MinHash / Jaccard). */
  def shingles(toks: Column, n: Int): Column =
    bindOnce(toks) { t =>
      when(size(t) < n, array(concat_ws(" ", t)))
        .otherwise(transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", slice(t, i + 1, lit(n)))))
    }

  /** Per-set token membership counts (array<int>, one entry per set) in a
    * single codegen'd pass.
    */
  def tokenSetCounts(toks: Column, sets: Seq[Seq[String]]): Column =
    GraftSqlBridge.column(TokenSetCounts(GraftSqlBridge.expression(toks), sets))

  /** Share of tokens that appear in `stopwords`. */
  def stopwordRatio(toks: Column, stopwords: Seq[String]): Column =
    bindOnce(toks) { t =>
      when(size(t) === 0, lit(0.0))
        .otherwise(
          element_at(tokenSetCounts(t, Seq(stopwords)), 1).cast("double") /
            size(t).cast("double"))
    }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
          length(text).cast("double"))

  /** Composite document quality score in [0, 1]: favors mid-length docs with
    * a natural-language stopword share and low punctuation noise (the
    * length/punct/stopword recipe used by LLM corpus filters).
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val lenScore  = least(size(toks).cast("double") / 50.0, lit(1.0))
    val stopScore = least(stopwordRatio(toks, stopwords) * 5.0, lit(1.0))
    val punctOk   = lit(1.0) - least(punctRatio(text) * 10.0, lit(1.0))
    round((lenScore * 0.4 + stopScore * 0.4 + punctOk * 0.2), 6)
  }

  def simhash(toks: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(toks)))

  /** Distinct murmur3 hashes of word-`n` shingles of a token-array column. */
  def hashedShingles(toks: Column, n: Int): Column =
    GraftSqlBridge.column(HashedShingles(GraftSqlBridge.expression(toks), n))

  /** Distinct xxhash64 hashes of word-`n` shingles; empty for docs shorter
    * than `n` tokens (corpus-gram statistics need full n-grams).
    */
  def hashedShingles64(toks: Column, n: Int): Column =
    GraftSqlBridge.column(HashedShingles64(GraftSqlBridge.expression(toks), n))

  /** MinHash signature (array of `numHashes` ints) of a hashed-shingle
    * int-array column — single-pass kernel, codegen-friendly.
    */
  def minhashSig(hashedShingles: Column, numHashes: Int): Column =
    GraftSqlBridge.column(
      MinHashSignature(GraftSqlBridge.expression(hashedShingles), numHashes))

  def rollingHash(text: Column): Column =
    GraftSqlBridge.column(RollingHash(GraftSqlBridge.expression(text)))

  /** Compressibility quality signal: deflate(text).bytes / text.bytes. */
  def deflateRatio(text: Column): Column =
    GraftSqlBridge.column(DeflateRatio(GraftSqlBridge.expression(text)))

  /** Per-occurrence xxhash64 gram hashes (one per start position, in order). */
  def positionalShingles64(toks: Column, n: Int): Column =
    GraftSqlBridge.column(PositionalShingles64(GraftSqlBridge.expression(toks), n))

  /** Token stream minus spans `[s, s+n)` for sorted starts `s`. */
  def dropCoveredTokens(toks: Column, starts: Column, n: Int): Column =
    GraftSqlBridge.column(DropCoveredTokens(
      GraftSqlBridge.expression(toks), GraftSqlBridge.expression(starts), n))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "builtin")
    registry.createOrReplaceTempFunction("rolling_hash",
      exprs => RollingHash(exprs.head), "builtin")
  }
}
