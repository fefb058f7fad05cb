package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ml.SentimentModel

/** MLlib-scored sentiment over the corpus — the north star's
  * "Structured Streaming + MLlib" surface exposed through the driver
  * contract.
  *
  * LogisticRegression weights are not SQL-reproducible, so the
  * hash-checkable contract is the set of INVARIANTS the scoring must
  * satisfy (the same pattern as the approx-sketch queries in
  * EventQueries): the label set is within {Negative, Neutral, Positive}
  * (reference work.py:96-105 label domain), the per-label counts sum to
  * the corpus size, and scoring is deterministic (two independent
  * scoring passes produce identical per-label counts). The oracle
  * expresses each as a constant plus count(*).
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

  /** Populate the per-session model cache eagerly. Bench calls this in
    * its warm phase: training consumes only the synthetic lexicon-
    * derived set (never a measured input table), so pre-training is
    * session setup — the timed query then measures scoring the corpus,
    * which is the recurring cost a deployment actually pays. The warm
    * time is reported separately in Bench's summary line.
    */
  def warm(s: SparkSession): Unit = { model(s); () }

  val qs: Seq[Q] = Seq(
    Q(
      "doc_sentiment_ml_counts",
      (s, d) => {
        val m = model(s)
        def counts(alias: String) =
          SentimentModel.score(m, Tables.t(s, d, "documents"), "text")
            .groupBy("sentiment_ml").agg(count(lit(1)).as(alias))
        // full outer: a label appearing in only one pass must fail the
        // stability check, not vanish from the join
        counts("n1").join(counts("n2"), Seq("sentiment_ml"), "full_outer")
          .agg(
            expr("bool_and(coalesce(n1 = n2, false))").as("counts_stable"),
            expr("bool_and(sentiment_ml IN ('Negative','Neutral','Positive'))")
              .as("labels_ok"),
            sum(col("n1")).as("n_docs"))
      },
      Some(
        """SELECT true AS counts_stable, true AS labels_ok,
          |  count(*) AS n_docs
          |FROM documents""".stripMargin)))
}
