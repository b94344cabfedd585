package graft.plans

import graft.functions.{CosineSimilarity, DotProduct, HashedShingles, L2Normalize, MinHashSignature, RollingHash, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Spark-native extension entry point: makes every custom graft expression a
  * first-class SQL function in ANY session configured with
  *
  * ```
  * spark.sql.extensions=graft.plans.GraftExtensions
  * ```
  *
  * — the standard third-party-engine integration path (no code changes in
  * the user's job, works from pure SQL, survives session cloning). The same
  * registrations are available imperatively via the `register(spark)`
  * helpers on [[graft.functions.VectorFunctions]] / `TextFunctions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => BinnedRangeJoinRule())
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two float vectors"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float vectors"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("l2_normalize"),
      info("l2_normalize", "l2_normalize(v) - unit-norm float vector"),
      (exprs: Seq[Expression]) => L2Normalize(exprs(0))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array"),
      (exprs: Seq[Expression]) => SimHash64(exprs(0))))
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(text) - 64-bit polynomial fingerprint"),
      (exprs: Seq[Expression]) => RollingHash(exprs(0))))
    ext.injectFunction((FunctionIdentifier("hashed_shingles"),
      info("hashed_shingles", "hashed_shingles(tokens, n) - distinct murmur3 word-n-gram hashes"),
      (exprs: Seq[Expression]) =>
        HashedShingles(exprs(0), intArg(exprs(1), "hashed_shingles n"))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(hashed_shingles, k) - k MinHash minima"),
      (exprs: Seq[Expression]) =>
        MinHashSignature(exprs(0), intArg(exprs(1), "minhash_sig k"))))
  }
}
