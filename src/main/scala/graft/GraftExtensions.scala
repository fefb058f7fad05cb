package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.PolarityScore

/** Session extensions: registers the engine's native expressions for SQL
  * use. Attach with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`; after that
  * `SELECT graft_polarity(text) FROM …` works from plain SQL.
  */
object GraftExtensions {
  /** builder with an explicit arity check: `graft_polarity(a, b)` must
    * fail analysis, not silently score only the first argument
    */
  val polarityBuilder: Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 1) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`graft_polarity`",
          "expectedNum" -> "1",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    }
    PolarityScore(exprs.head)
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_polarity"),
      new ExpressionInfo(classOf[PolarityScore].getName, "graft_polarity"),
      GraftExtensions.polarityBuilder))
  }
}
