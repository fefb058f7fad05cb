package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_bpe_runs(string) -> int`: the BPE pre-tokenization token
  * count — number of maximal runs of letters `[a-z]+`, digits `[0-9]+`,
  * or non-alnum-non-space `[^a-z0-9\s]+` — in ONE byte-level pass.
  *
  * Replaces `size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|
  * [^a-z0-9\s]+', 0))`, which materializes an array of every match just
  * to take its length and pays the java.util.regex scan per row
  * (BENCH_r05: 6.2 s at sf0.1 for a narrow map). The kernel counts
  * class transitions instead: classify each byte (ASCII letter / digit /
  * Java-regex `\s` whitespace / other) and count positions where a
  * non-whitespace class differs from its predecessor's. Multi-byte
  * UTF-8 sequences are all `other`-class bytes, so they merge with
  * adjacent punctuation into one run — exactly the `[^a-z0-9\s]+`
  * match. Callers pass `lower(text)` so uppercase (including the
  * non-ASCII specials whose lowercase IS ASCII, e.g. U+212A -> k)
  * classifies identically to the regex form.
  */
case class BpeRunCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any): Any =
    BpeRunCount.count(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BpeRunCount.count($a);")

  override protected def withNewChildInternal(
      newChild: Expression): BpeRunCount = copy(child = newChild)

  override def prettyName: String = "graft_bpe_runs"
}

object BpeRunCount {
  /** classes: 0 = whitespace (Java regex `\s` = [ \t\n\x0B\f\r]),
    * 1 = [a-z], 2 = [0-9], 3 = everything else (incl. every byte of a
    * multi-byte UTF-8 char)
    */
  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    var runs = 0
    var prev = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val cls =
        if (b >= 'a' && b <= 'z') 1
        else if (b >= '0' && b <= '9') 2
        else if (b == ' ' || (b >= 0x09 && b <= 0x0d)) 0
        else 3
      if (cls != 0 && cls != prev) runs += 1
      prev = cls
      i += 1
    }
    runs
  }

  def column(c: Column): Column =
    GraftSqlBridge.column(BpeRunCount(GraftSqlBridge.expression(c)))
}
