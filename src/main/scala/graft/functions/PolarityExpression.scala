package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sentiment.Sentiment

/** Native Catalyst expression for the pattern-lexicon polarity scorer —
  * SURVEY.md §2.4 U1 option (b), the performance path over the Scala UDF.
  *
  * The UDF forces a per-row catalyst<->Scala conversion and acts as an
  * optimization barrier; this expression participates in whole-stage
  * codegen — the generated Java calls the static scorer directly on the
  * row's UTF8String — so filters and pruning push straight through, and
  * the whole text pipeline stays one codegen stage.
  *
  * null => 0.0, matching the reference's null semantics
  * (streaming_pipeline.py:50–55).
  */
case class PolarityScore(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0.0
    else Sentiment.polarityDouble(v.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        double ${ev.value} = ${c.isNull}
          ? 0.0
          : graft.sentiment.Sentiment.polarityDouble(${c.value}.toString());
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PolarityScore =
    copy(child = newChild)

  override def prettyName: String = "graft_polarity"
}

object PolarityScore {
  /** Column-API entry: polarityNative(text). */
  def polarityNative(c: Column): Column =
    GraftSqlBridge.column(PolarityScore(GraftSqlBridge.expression(c)))
}
