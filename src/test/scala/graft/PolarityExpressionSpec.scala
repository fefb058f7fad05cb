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

  test("all GraftExtensions functions register and evaluate from SQL") {
    val classic =
      org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
    graft.GraftExtensions.functions.foreach { case (name, _, builder) =>
      classic.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    val r = spark.sql(
      """SELECT graft_simhash64(array('a', 'b')) AS s,
        |  graft_minhash16(array('a b c')) AS m,
        |  graft_lsh_sig(array_repeat(float(0.5), 64)) AS g,
        |  graft_dot(array(float(1), float(2)), array(float(3), float(4))) AS d,
        |  graft_l2sq(array(float(1)), array(double(3))) AS l""".stripMargin)
      .collect().head
    assert(r.getAs[Long]("s") != 0L)
    assert(r.getSeq[Long](1).length == 16)
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Double]("l") == 4.0)
  }
}
