package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.SentimentModel

/** MLlib pipeline: trains on the deterministic synthetic set, separates
  * held-out positive/negative phrases, and round-trips through ML
  * persistence.
  */
class SentimentModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val model = SentimentModel.train(spark)

  test("model separates held-out sentiment phrases") {
    import spark.implicits._
    val held = Seq(
      ("wonderful excellent news today", 1.0),
      ("great gain for the quarter", 1.0),
      ("terrible awful crash report", 0.0),
      ("worst failure and decline", 0.0)).toDF("text", "label")
    val scored = SentimentModel.score(model, held)
      .select("label", "polarity_ml", "sentiment_ml").collect()
    scored.foreach { r =>
      val (label, p, s) = (r.getDouble(0), r.getDouble(1), r.getString(2))
      if (label == 1.0) assert(p > 0.1 && s == "Positive", r.toString)
      else assert(p < -0.1 && s == "Negative", r.toString)
    }
  }

  test("scoring is a pure map — no shuffle in the plan") {
    val docs = Tables.t(spark, TestSpark.sf0001, "documents")
    val scored = SentimentModel.score(model, docs, "text")
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  test("save/load round-trip preserves predictions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ml_model").toFile.getAbsolutePath
    SentimentModel.save(model, dir)
    val loaded = SentimentModel.load(dir)
    val probe = Seq("strong growth and success", "fear of crisis and loss")
      .toDF("text")
    val a = SentimentModel.score(model, probe)
      .select("polarity_ml").collect().map(_.getDouble(0)).toSeq
    val b = SentimentModel.score(loaded, probe)
      .select("polarity_ml").collect().map(_.getDouble(0)).toSeq
    assert(a == b)
  }
}
