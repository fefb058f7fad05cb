package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_norm_tokens(string) -> array<string>`: the clean+tokenize
  * entry of every text lineage (TextFns.tokens(TextFns.clean(text))) as
  * ONE byte-level pass. The composed form materializes three
  * intermediate strings per row (two regexp_replace engines + a split
  * producing empty fragments that a HOF filter then drops); this kernel
  * walks the UTF-8 bytes once, copying only the surviving token bytes.
  *
  * Semantics are EXACTLY the composed form's, which the DuckDB oracle
  * CTEs (TextFns.cleanSql/tokensSql) also encode:
  *   - keep a-z; map A-Z to +32 (lower() on a letters-only ASCII string
  *     is the per-byte map);
  *   - the six Java `\s` bytes (space \t \n \x0B \f \r) delimit tokens;
  *   - every other byte is DELETED, not a delimiter ("a,b" -> "ab"),
  *     including every byte of a multi-byte UTF-8 char (>= 0x80, never
  *     a letter or Java `\s`);
  *   - no empty tokens; NULL text behaves as '' (empty array), matching
  *     clean()'s coalesce.
  */
case class NormTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) NormTokens.empty
    else NormTokens.tokens(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${c.isNull}
          ? graft.functions.NormTokens.empty()
          : graft.functions.NormTokens.tokens(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NormTokens =
    copy(child = newChild)

  override def prettyName: String = "graft_norm_tokens"
}

object NormTokens {
  private val EmptyArray = new GenericArrayData(new Array[AnyRef](0))

  def empty(): ArrayData = EmptyArray

  def tokens(u: UTF8String): ArrayData = {
    val b = u.getBytes
    val n = b.length
    if (n == 0) return EmptyArray
    val out = new java.util.ArrayList[AnyRef](8)
    // surviving bytes never outnumber input bytes, so one scratch buffer
    // of input length holds any token
    val buf = new Array[Byte](n)
    var blen = 0
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c >= 'a' && c <= 'z') { buf(blen) = c; blen += 1 }
      else if (c >= 'A' && c <= 'Z') { buf(blen) = (c + 32).toByte; blen += 1 }
      else if (c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' ||
          c == '\r') {
        if (blen > 0) {
          out.add(UTF8String.fromBytes(java.util.Arrays.copyOf(buf, blen)))
          blen = 0
        }
      }
      // every other byte (punctuation, digits, any >= 0x80) is deleted
      i += 1
    }
    if (blen > 0) out.add(UTF8String.fromBytes(java.util.Arrays.copyOf(buf, blen)))
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry: normTokens(text) == tokens(clean(text)). */
  def column(c: Column): Column =
    GraftSqlBridge.column(NormTokens(GraftSqlBridge.expression(c)))
}
