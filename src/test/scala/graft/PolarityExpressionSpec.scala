package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PolarityScore
import graft.sentiment.Sentiment

/** The native Catalyst expression must agree with the UDF scorer
  * everywhere, stay inside whole-stage codegen, and be callable from SQL
  * via GraftExtensions-style registration.
  */
class PolarityExpressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("native expression == double UDF on the documents corpus") {
    val docs = Tables.t(spark, TestSpark.sf0001, "documents")
      .withColumn("c", lower(regexp_replace(col("text"), "[^a-zA-Z\\s]", "")))
    val diff = docs
      .withColumn("a", PolarityScore.polarityNative(col("c")))
      .withColumn("b", Sentiment.polarityDoubleUdf(col("c")))
      .filter(col("a") =!= col("b"))
      .count()
    assert(diff == 0)
  }

  test("null input evaluates to 0.0, not null") {
    import spark.implicits._
    val row = Seq(("x", Option.empty[String]), ("y", Some("great win")))
      .toDF("k", "t")
      .withColumn("p", PolarityScore.polarityNative(col("t")))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(row("x") == 0.0)
    assert(row("y") > 0.5)
  }

  test("expression participates in whole-stage codegen") {
    val docs = Tables.t(spark, TestSpark.sf0001, "documents")
      .withColumn("p", PolarityScore.polarityNative(col("text")))
      .filter(col("p") > 0)
    val plan = docs.queryExecution.executedPlan.toString
    // the *(n) prefix marks operators inside a WholeStageCodegen stage;
    // the Filter containing the scorer must carry it
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_polarity") && l.trim.matches("""^[+-]*\s*\*\(\d+\).*""")),
      plan.take(500))
    // and it must not be evaluated behind a UDF barrier
    assert(!plan.contains("BatchEval") && !plan.contains("ScalaUDF"))
  }

  test("SQL registration via GraftExtensions function injection") {
    spark.sql("SELECT 1").collect() // session warm
    val classic =
      org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_polarity",
      graft.GraftExtensions.polarityBuilder, "built-in")
    val r = spark.sql(
      "SELECT graft_polarity('great success story') AS p").collect()
    assert(math.abs(r.head.getDouble(0) - 0.7) < 1e-6)
    // wrong arity fails analysis instead of silently dropping arguments
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_polarity('a', 'b')").collect()
    }
    assert(e.getMessage.contains("graft_polarity"))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_polarity()").collect()
    }
  }
}
