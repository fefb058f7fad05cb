package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native JVM kernels for the dedup hash pipelines — SURVEY.md §2.4
  * option (b): a custom codegen'd Expression beats the higher-order-
  * function formulation (transform/aggregate lambdas evaluate
  * interpreted, re-walking arrays per hash function; measured 4-8x
  * slower at sf0.1) and beats a Scala UDF (no catalyst<->Scala row
  * conversion, no optimization barrier).
  *
  * BIT-FOR-BIT parity with the oracle-checked SQL formulation: the SQL
  * twins parse md5 hex chars 1-8 / 9-16 / 1-12 via positional arithmetic
  * — exactly the unsigned big-endian value of digest bytes 0-3 / 4-7 /
  * 0-5, which these kernels read directly off the digest. The DuckDB
  * oracle still checks the SQL semantics; DedupSpec pins kernel ==
  * HOF-expression equality on the same session.
  */
object HashKernels {

  /** Mersenne prime 2^31-1, the minhash modulus (DedupQueries.P) */
  val P = 2147483647L

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private def digest(s: org.apache.spark.unsafe.types.UTF8String): Array[Byte] = {
    val d = md5.get()
    d.reset()
    d.digest(s.getBytes)
  }

  /** unsigned big-endian 32-bit value of digest bytes [off, off+4) —
    * equals the hex-chars [2*off+1, 2*off+8] positional parse
    */
  private def be32(h: Array[Byte], off: Int): Long =
    ((h(off) & 0xffL) << 24) | ((h(off + 1) & 0xffL) << 16) |
      ((h(off + 2) & 0xffL) << 8) | (h(off + 3) & 0xffL)

  /** 64-bit SimHash over a token array: per token ONE md5; the two
    * 32-bit halves are digest bytes 0-3 and 4-7; per-bit ±1 sums; sign
    * => fingerprint bit. Empty/null array => 0 (the pinned empty-doc
    * fingerprint). Null elements are skipped (unreachable from the
    * tokenizer, which never emits null tokens).
    */
  def simhash64(arr: ArrayData): Long = {
    if (arr == null) return 0L
    val n = arr.numElements()
    if (n == 0) return 0L
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = digest(arr.getUTF8String(i))
        val lo = be32(h, 0)
        val hi = be32(h, 4)
        var b = 0
        while (b < 32) {
          counts(b) += (((lo >> b) & 1L) * 2 - 1).toInt
          counts(b + 32) += (((hi >> b) & 1L) * 2 - 1).toInt
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** 16 affine minhashes over a shingle array in one pass: shingle value
    * = digest bytes 0-5 (48-bit) mod P; h_i = min over shingles of
    * (v*(2i+3) + 104729i + 12345) mod P — the same family as
    * DedupQueries.aCoef/bCoef. Empty/null array => all-P signature (the
    * fold's init value; unreachable, the shingler always emits >= 1).
    */
  def minhash16(arr: ArrayData): ArrayData = {
    val mins = Array.fill(16)(P)
    if (arr != null) {
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = digest(arr.getUTF8String(i))
          val v = ((be32(h, 0) << 16) | ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)) % P
          var j = 0
          while (j < 16) {
            val x = (v * (2 * j + 3) + 104729L * j + 12345L) % P
            if (x < mins(j)) mins(j) = x
            j += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(mins)
  }
}

/** `graft_simhash64(array<string>) -> bigint`, codegen'd. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    HashKernels.simhash64(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = graft.functions.HashKernels.simhash64(
          ${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash64"
}

object SimHash64 {
  def column(c: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(c)))
}

/** `graft_minhash16(array<string>) -> array<bigint>`, codegen'd. */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    HashKernels.minhash16(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.HashKernels.minhash16(
            ${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash16"
}

object MinHashSig {
  def column(c: Column): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(c)))
}
