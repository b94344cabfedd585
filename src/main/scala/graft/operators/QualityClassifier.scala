package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document quality filtering — the trained-classifier stage of
  * web-corpus curation (the GPT-3 recipe, Brown et al. 2020 appendix A:
  * a logistic-regression quality classifier scores every crawl document and
  * the corpus is filtered on the score): featurize each document from the
  * engine's own cheap quality signals, train a logistic regression on
  * labeled examples, score the corpus distributed.
  *
  * Spark-first: features are a codegen'd projection (every signal is a
  * native expression — no Python, no per-row model services); training is
  * `spark.ml` L-BFGS (deterministic for fixed data and params); scoring is
  * one `transform` — a broadcast of the coefficient vector into a narrow
  * map, which at 100 TB is exactly a scan. Pair the scores with
  * [[TextAnalysis.quantileQualityFilter]] to keep the top mass per source.
  */
object QualityClassifier {

  /** Feature column (array<double>) from per-doc quality signals:
    * log1p token count, stopword ratio, punctuation ratio, deflate
    * compression ratio, and the composite heuristic score.
    */
  def featureArray(textCol: Column, stopwords: Seq[String]): Column = {
    val toks = TextFunctions.tokens(textCol)
    array(
      log1p(size(toks).cast("double")),
      TextFunctions.stopwordRatio(toks, stopwords),
      TextFunctions.punctRatio(textCol),
      TextFunctions.deflateRatio(textCol),
      TextFunctions.qualityScore(textCol, stopwords))
  }

  /** Train on `labeled` (`textCol` + binary `labelCol`, 1 = high quality).
    * Every L-BFGS iteration is one Spark job over the (cached) instances,
    * so the iteration budget IS the training wall time: the default
    * `tol`/`maxIter` stop well past what a quality filter needs — a score
    * that RANKS documents is insensitive to the last decimals of the
    * coefficients.
    */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
      stopwords: Seq[String] = TextAnalysis.defaultStopwords,
      maxIter: Int = 25, regParam: Double = 0.01,
      tol: Double = 1e-4): LogisticRegressionModel =
    new LogisticRegression()
      .setMaxIter(maxIter)
      .setRegParam(regParam)
      .setTol(tol)
      .setFeaturesCol("__features")
      .setLabelCol(labelCol)
      .fit(labeled.withColumn("__features",
        array_to_vector(featureArray(col(textCol), stopwords))))

  /** Score `docs`: adds `quality_prob` (P(high quality) in [0,1]).
    * The probability vector unpacks through `vector_to_array` +
    * `element_at` — native expressions end to end, no Scala UDF (closure
    * serialization, boxed eval, no codegen) in the scoring scan.
    */
  def score(model: LogisticRegressionModel, docs: DataFrame, textCol: String,
      stopwords: Seq[String] = TextAnalysis.defaultStopwords): DataFrame =
    model
      .transform(docs.withColumn("__features",
        array_to_vector(featureArray(col(textCol), stopwords))))
      .withColumn("quality_prob",
        element_at(vector_to_array(col(model.getProbabilityCol)), 2))
      .drop("__features", model.getRawPredictionCol, model.getProbabilityCol,
        model.getPredictionCol)
}
