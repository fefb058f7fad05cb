package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Prop, Test => SCTest}
import graft.sentiment.{Lexicon, Sentiment}

/** Unit + property coverage for the pattern-style scorer — invariants per
  * SURVEY.md §5.3 and the reference's null/threshold semantics
  * (streaming_pipeline.py:50–66).
  */
class SentimentSpec extends AnyFunSuite {

  test("null/empty/no-match => 0.0") {
    assert(Sentiment.polarity(null) == 0.0f)
    assert(Sentiment.polarity("") == 0.0f)
    assert(Sentiment.polarity("   ") == 0.0f)
    assert(Sentiment.polarity("zzz qqq unknownwords") == 0.0f)
  }

  test("golden scores (pinned)") {
    // avg of great(0.8), success(0.6) => 0.7
    assert(math.abs(Sentiment.polarity("great success story") - 0.7f) < 1e-6)
    // terrible(-1.0), crisis(-0.6), failure(-0.6) => -0.7333
    assert(math.abs(
      Sentiment.polarity("terrible crisis failure") + 0.73333335f) < 1e-6)
    // negation flips and damps: not good => 0.7 * -0.5 = -0.35
    assert(math.abs(Sentiment.polarity("not good") + 0.35f) < 1e-6)
    // intensifier scales: very good => 0.7 * 1.3 = 0.91
    assert(math.abs(Sentiment.polarity("very good") - 0.91f) < 1e-6)
    // negation reaches over one token: not very good => 0.91 * -0.5
    assert(math.abs(Sentiment.polarity("not very good") + 0.455f) < 1e-6)
  }

  test("polarity is total and bounded on arbitrary strings") {
    val prop = Prop.forAll { (s: String) =>
      val p = Sentiment.polarity(s)
      p >= -1.0f && p <= 1.0f
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("single lexicon word scores its base polarity") {
    Lexicon.polarity.foreach { case (w, base) =>
      assert(Sentiment.polarity(w) == base, s"word $w")
    }
  }

  test("label/confidence thresholds (reference ±0.1, 0.2/0.5)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(-1.0f, -0.51f, -0.5f, -0.21f, -0.2f, -0.11f, -0.1f, 0.0f,
        0.1f, 0.11f, 0.2f, 0.21f, 0.5f, 0.51f, 1.0f)
      .toDF("p")
      .select(col("p"), Sentiment.label(col("p")).as("l"),
        Sentiment.confidence(col("p")).as("c"))
    val rows = df.collect()
      .map(r => r.getFloat(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(rows(-1.0f) == ("Negative", "High"))
    assert(rows(-0.5f) == ("Negative", "Medium"))
    assert(rows(-0.2f) == ("Negative", "Low"))
    assert(rows(-0.11f) == ("Negative", "Low"))
    assert(rows(-0.1f) == ("Neutral", "Low"))
    assert(rows(0.0f) == ("Neutral", "Low"))
    assert(rows(0.1f) == ("Neutral", "Low"))
    assert(rows(0.11f) == ("Positive", "Low"))
    assert(rows(0.21f) == ("Positive", "Medium"))
    assert(rows(0.51f) == ("Positive", "High"))
  }
}
