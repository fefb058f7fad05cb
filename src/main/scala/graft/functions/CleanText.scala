package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_clean_text(string) -> string`: the reference's clean step
  * (streaming_pipeline.py:122–128) — lower + strip non-letters —
  * as ONE byte-level pass instead of a regex engine walk plus a second
  * lowercasing pass over the intermediate string.
  *
  * Semantics are EXACTLY
  * `lower(regexp_replace(coalesce(text, ''), "[^a-zA-Z\\s]", ""))`
  * (TextFns's composed form, which the DuckDB oracle's cleanSql also
  * encodes):
  *   - keep a-z; map A-Z to +32 (lower() on a letters+whitespace ASCII
  *     string is the per-byte map);
  *   - keep the six Java `\s` bytes (space \t \n \x0B \f \r) verbatim
  *     (the regex's negated class spares them; lower() leaves them);
  *   - DELETE every other byte, including every byte of a multi-byte
  *     UTF-8 char (each is >= 0x80, never a-zA-Z or Java `\s`, and
  *     dropping a char's bytes individually equals dropping the char);
  *   - NULL text behaves as '' (the coalesce).
  *
  * Output length never exceeds input length, so the kernel writes into
  * one scratch buffer sized by the input — no growth, no second pass.
  * Shares the byte classification of [[NormTokens]] (which fuses this
  * clean WITH tokenization); this kernel is for lineages that need the
  * cleaned STRING itself (display/export columns, concat_ws combines).
  */
case class CleanText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) UTF8String.EMPTY_UTF8
    else CleanText.clean(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.unsafe.types.UTF8String ${ev.value} = ${c.isNull}
          ? org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
          : graft.functions.CleanText.clean(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CleanText =
    copy(child = newChild)

  override def prettyName: String = "graft_clean_text"
}

object CleanText {

  def clean(u: UTF8String): UTF8String = {
    val b = u.getBytes
    val n = b.length
    if (n == 0) return UTF8String.EMPTY_UTF8
    val buf = new Array[Byte](n)
    var blen = 0
    var changed = false
    var i = 0
    while (i < n) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || c == ' ' || c == '\t' || c == '\n' ||
          c == 0x0B || c == '\f' || c == '\r') {
        buf(blen) = c; blen += 1
      } else if (c >= 'A' && c <= 'Z') {
        buf(blen) = (c + 32).toByte; blen += 1; changed = true
      } else {
        // every other byte (punctuation, digits, any >= 0x80) is deleted
        changed = true
      }
      i += 1
    }
    if (!changed) u // already clean: reuse the input bytes
    else UTF8String.fromBytes(java.util.Arrays.copyOf(buf, blen))
  }

  /** Column-API entry: cleanText(text) == lower(regexp_replace(…)). */
  def column(c: Column): Column =
    GraftSqlBridge.column(CleanText(GraftSqlBridge.expression(c)))
}
