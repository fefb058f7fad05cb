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

  /** shingle value = digest bytes 0-5 (48-bit) mod P; folds the value
    * into all 16 running affine minima — h_i = min over shingles of
    * (v*(2i+3) + 104729i + 12345) mod P, the DedupQueries.aCoef/bCoef
    * family
    */
  private def foldShingle(s: org.apache.spark.unsafe.types.UTF8String,
      mins: Array[Long]): Unit = {
    val h = digest(s)
    val v = ((be32(h, 0) << 16) | ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)) % P
    var j = 0
    while (j < 16) {
      val x = (v * (2 * j + 3) + 104729L * j + 12345L) % P
      if (x < mins(j)) mins(j) = x
      j += 1
    }
  }

  /** 16 affine minhashes over a shingle array in one pass. Empty/null
    * array => NULL, matching the oracle/HOF formulation (array_min over
    * an empty transform yields NULL) — unreachable from the shingler,
    * which always emits >= 1 shingle, but reachable through the
    * registered SQL function graft_minhash16(array()).
    */
  def minhash16(arr: ArrayData): ArrayData = {
    if (arr == null || arr.numElements() == 0) return null
    val mins = Array.fill(16)(P)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) foldShingle(arr.getUTF8String(i), mins)
      i += 1
    }
    new GenericArrayData(mins)
  }

  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** The shingler FUSED into minhash16: 16 affine minhashes over the
    * 3-token shingles of a token array, built in place — per-doc shingle
    * string arrays never materialize through an interpreted transform()
    * (which is what made the standalone pipeline the round-2 bench tail).
    * Shingle text is identical to DedupQueries.shingleCol and its oracle
    * twin: tok[i]+" "+tok[i+1]+" "+tok[i+2] for n >= 3, else ONE shingle
    * = all tokens joined by " " ("" for an empty or null token array —
    * the oracle's coalesce(array_to_string(tok,' '),'') branch). Null
    * tokens are skipped within a shingle, like concat_ws.
    */
  def minhash16Shingles(arr: ArrayData): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val mins = Array.fill(16)(P)
    val n = if (arr == null) 0 else arr.numElements()
    // null slots read as null (concatWs skips them) — never read an
    // unsafe array's bytes at a null position
    def tokAt(i: Int): UTF8String =
      if (arr.isNullAt(i)) null else arr.getUTF8String(i)
    if (n >= 3) {
      var i = 0
      while (i + 2 < n) {
        foldShingle(
          UTF8String.concatWs(Space, tokAt(i), tokAt(i + 1), tokAt(i + 2)),
          mins)
        i += 1
      }
    } else {
      val toks = new Array[UTF8String](n)
      var i = 0
      while (i < n) { toks(i) = tokAt(i); i += 1 }
      foldShingle(UTF8String.concatWs(Space, toks: _*), mins)
    }
    new GenericArrayData(mins)
  }
}

/** Shared SimHash banding policy — the batch near-pair query
  * (DedupQueries dedup_simhash_pairs) and its streaming twin
  * (NewsStream.dedupNearSimhashWithinWatermark) both derive from these
  * constants, so the two surfaces can never drift: 64-bit fingerprints,
  * 4 x 16-bit bands (65,536 keys per band), and the pigeonhole bound —
  * two fingerprints within hamming Bands-1 must agree on at least one
  * band, so band-keyed candidate generation is EXACT at hamming <=
  * MaxHamming, never O(n²).
  */
object SimHashBands {
  val Bits = 64
  val Bands = 4
  val BandBits: Int = Bits / Bands // 16 -> 65,536 keys per band
  val BandMask: Long = (1L << BandBits) - 1
  val MaxHamming: Int = Bands - 1
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

/** `graft_minhash16(array<string>) -> array<bigint>`, codegen'd.
  * NULL for an empty/null shingle array (the oracle's array_min-over-
  * empty convention).
  */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

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
        boolean ${ev.isNull} = ${ev.value} == null;
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash16"
}

object MinHashSig {
  def column(c: Column): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(c)))
}

/** `graft_minhash16_shingle(array<string>) -> array<bigint>`, codegen'd:
  * the 3-token shingler fused into the 16-way minhash (see
  * HashKernels.minhash16Shingles). Total, never NULL — empty/null token
  * arrays hash the single empty shingle "".
  */
case class MinHashShingleSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    HashKernels.minhash16Shingles(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.HashKernels.minhash16Shingles(
            ${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashShingleSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash16_shingle"
}

object MinHashShingleSig {
  def column(c: Column): Column =
    GraftSqlBridge.column(MinHashShingleSig(GraftSqlBridge.expression(c)))
}
