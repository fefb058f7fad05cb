package org.apache.spark.ml

import org.apache.spark.ml.util.HasTrainingSummary

/** Graft-internal bridge into Spark ML's `private[ml]` summary slot.
  *
  * Why it exists: a freshly `fit` LogisticRegressionModel carries a
  * training summary whose predictions Dataset pins the training
  * SparkSession; caching such a model for the session's lifetime then
  * drags the session into every scoring task closure (see
  * graft.ml.SentimentModel for the failure mode). The public way to shed
  * the summary is a save/load round-trip through ML persistence — a
  * dozen small Spark jobs (~3 s measured) for what is semantically one
  * field write. `HasTrainingSummary.setSummary` is `private[ml]`, so the
  * one-line fix lives in this `org.apache.spark.ml`-packaged shim; it
  * touches only the public-source Spark API surface (HasTrainingSummary
  * is in the published spark-mllib jar).
  */
object GraftSummaryShed {

  /** Drop the training summary from every stage that has one; returns
    * the same model, now carrying weights only — the shape a
    * deployment scores with, without the persistence round-trip.
    */
  def shed(model: PipelineModel): PipelineModel = {
    model.stages.foreach {
      case h: HasTrainingSummary[_] =>
        h.setSummary(None)
      case _ => ()
    }
    model
  }
}
