package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, RegexTokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sentiment.Lexicon

/** MLlib sentiment surface — the north star's "Structured Streaming +
  * MLlib" approach (BASELINE.json): RegexTokenizer → HashingTF →
  * LogisticRegression producing a [-1, 1] score alongside the lexicon
  * scorer. The reference itself never ships a trained model (TextBlob is
  * lexicon-based), so training data is synthesized deterministically
  * from our own lexicon and the model is pinned by behavioral tests,
  * not golden weights.
  *
  * Scale notes: scoring is a pure map (tokenize + hash + dot product) —
  * no shuffle, streaming-safe (`model.transform` works on streaming
  * DataFrames); training on a 1000-executor cluster uses the same code
  * path since LogisticRegression is already distributed.
  */
object SentimentModel {

  /** 4096 is plenty for the ~60-word lexicon vocabulary (collision odds
    * negligible) and keeps LR's per-iteration dense-coefficient
    * aggregation cheap — training cost scales with this. */
  val NumFeatures: Int = 1 << 12

  def buildPipeline(): Pipeline = {
    val tok = new RegexTokenizer()
      .setInputCol("text").setOutputCol("words")
      .setPattern("\\s+").setGaps(true).setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol("words").setOutputCol("features")
      .setNumFeatures(NumFeatures)
    // maxIter 6: the enumerated training set is linearly separable, so
    // LBFGS reaches a wide margin in a handful of iterations; each
    // iteration is a scheduled Spark job (~0.3 s of driver overhead on
    // 180 rows), so the cap is wall-clock, not accuracy. The held-out
    // separation spec (SentimentModelSpec) pins that the margin stays
    // comfortably past the |polarity| > 0.1 classification band.
    val lr = new LogisticRegression()
      .setMaxIter(6).setRegParam(0.01)
      .setFeaturesCol("features").setLabelCol("label")
    new Pipeline().setStages(Array(tok, tf, lr))
  }

  /** Deterministic synthetic training set: phrases enumerated from the
    * lexicon (no RNG — reproducible across runs and engines).
    */
  def trainingData(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val pos = Lexicon.polarity.filter(_._2 > 0.2f).keys.toSeq.sorted
    val neg = Lexicon.polarity.filter(_._2 < -0.2f).keys.toSeq.sorted
    val neutral = Seq("market", "report", "update", "daily", "item", "note")
    val posRows = for {
      (p, i) <- pos.zipWithIndex
      f <- neutral.take(3)
    } yield (s"$p ${neutral(i % neutral.size)} $f", 1.0)
    val negRows = for {
      (n, i) <- neg.zipWithIndex
      f <- neutral.take(3)
    } yield (s"$n ${neutral(i % neutral.size)} $f", 0.0)
    (posRows ++ negRows).toDF("text", "label")
  }

  /** coalesce(1): the enumerated training set is ~60 rows — left at
    * default parallelism every LR iteration schedules one near-empty
    * task per core (10 iterations x 32 tasks of 2 rows), which is pure
    * scheduler overhead. One slice, one task per iteration. A real
    * corpus-sized training set would keep its natural partitioning.
    */
  def train(spark: SparkSession): PipelineModel = {
    val fitted = buildPipeline().fit(trainingData(spark).coalesce(1))
    // Shed the LR trainingSummary in place: the summary pins the
    // training SparkSession, and a model cached for the session's
    // lifetime then drags that session into every scoring task closure.
    // That is a live grenade — the session serializes only while its
    // lazily-initialized internals (e.g. the ObservationManager, once
    // any observe() runs) happen to be untouched. Earlier rounds paid a
    // save/load round-trip (~3 s of small Spark jobs) for the same
    // effect; GraftSummaryShed clears the private[ml] slot directly, so
    // the cached model carries weights only — the shape a real
    // deployment scores with. The save/load path stays spec-covered via
    // save()/load() below.
    org.apache.spark.ml.GraftSummaryShed.shed(fitted)
  }

  /** Adds `polarity_ml` in [-1, 1] (2·P(positive) − 1) and
    * `sentiment_ml`. Works identically on batch and streaming frames.
    */
  def score(model: PipelineModel, df: DataFrame,
      textCol: String = "text"): DataFrame = {
    // NULL text scores like empty text (RegexTokenizer NPEs on null) —
    // the same null-normalization convention as TextFns.clean
    val base = df.withColumn("text", coalesce(col(textCol), lit("")))
    model.transform(base)
      .withColumn("polarity_ml",
        vector_to_array(col("probability")).getItem(1) * 2 - 1)
      .withColumn("sentiment_ml",
        when(col("polarity_ml") > 0.1, "Positive")
          .when(col("polarity_ml") < -0.1, "Negative")
          .otherwise("Neutral"))
      .drop("words", "features", "rawPrediction", "probability",
        "prediction")
  }

  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  def load(path: String): PipelineModel = PipelineModel.load(path)
}
