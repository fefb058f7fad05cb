package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ml.SentimentModel

/** MLlib-scored sentiment over the corpus — the north star's
  * "Structured Streaming + MLlib" surface exposed through the driver
  * contract. No DuckDB oracle: LogisticRegression weights are not
  * reproducible in SQL, so the driver records a rows-only check
  * (deterministic nonetheless: training data is enumerated, optimizer
  * seeds are fixed by MLlib defaults).
  */
object MlQueries {

  /** one training run per SparkSession — Verify/Bench invoke many
    * queries. Keyed on the session (not a JVM-wide constant) so a
    * stop-and-recreate cycle retrains instead of transforming through a
    * model bound to a dead SparkContext; dead-session entries are
    * dropped on the way in.
    */
  private val cache = new ConcurrentHashMap[SparkSession, PipelineModel]()
  private def model(s: SparkSession): PipelineModel = {
    cache.keySet.removeIf(k => k.sparkContext.isStopped)
    cache.computeIfAbsent(s, k => SentimentModel.train(k))
  }

  val qs: Seq[Q] = Seq(
    Q(
      "doc_sentiment_ml_counts",
      (s, d) =>
        SentimentModel.score(model(s), Tables.t(s, d, "documents"), "text")
          .groupBy("sentiment_ml").agg(count(lit(1)).as("n"))
          .orderBy("sentiment_ml"),
      None))
}
