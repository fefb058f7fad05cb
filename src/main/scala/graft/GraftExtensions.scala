package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.PolarityScore

/** Session extensions: registers the engine's native expressions for SQL
  * use. Attach with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`; after that
  * `SELECT graft_polarity(text) FROM …` works from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_polarity"),
      new ExpressionInfo(classOf[PolarityScore].getName, "graft_polarity"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolarityScore(exprs.head)))
  }
}
