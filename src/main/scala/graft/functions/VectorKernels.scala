package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native vector math for the embedding queries — the codegen'd
  * replacement for aggregate(zip_with(...)) folds, which evaluate
  * interpreted per element. Accumulation is double, LEFT-TO-RIGHT IN
  * ARRAY ORDER, exactly like the SQL-expression twins the DuckDB oracle
  * checks (EmbQueries.dotSql: list_sum over in-order products), so
  * results are bit-identical; VectorKernelsSpec pins the equality.
  *
  * Element-type adaptive: every kernel accepts `array<float>` OR
  * `array<double>` per side — the expression resolves the element type
  * STATICALLY from the child schema and passes it as a constant, so a
  * future testdata regeneration that widens embeddings to double (the
  * events-`ts` class of breakage: three physical shapes across regens)
  * changes nothing. float elements widen losslessly per element, so a
  * double file holding the widened floats produces bit-identical
  * results (TwoShapeSpec pins this).
  */
object VectorKernels {

  /** element i widened to double — `isD` is a schema constant, so the
    * branch predicts perfectly and JIT hoists it
    */
  @inline def elem(a: ArrayData, i: Int, isD: Boolean): Double =
    if (isD) a.getDouble(i) else a.getFloat(i).toDouble

  /** sum_i a[i]*b[i], elements widened to double. Returns null (boxed)
    * on length mismatch or a null element — matching the
    * aggregate(zip_with(...)) fold, where zip_with null-pads the shorter
    * array and a null product nulls the sum. A ragged/corrupt embedding
    * must surface as NULL, not flow through as a plausible partial dot.
    */
  def dotFF(a: ArrayData, aD: Boolean, b: ArrayData, bD: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elem(a, i, aD) * elem(b, i, bD)
      i += 1
    }
    acc
  }

  /** Safe cosine in ONE pass: the three sums (a·b, a·a, b·b) accumulate
    * independently in array order, so each is bit-identical to its own
    * dotFF; sqrt/multiply/divide are IEEE-exact, so the result equals
    * the compose-of-dots form the oracle SQL expresses. Zero-norm
    * inputs yield 0.0 (the pinned convention — ANSI division would
    * throw, the oracle's x/0 would be NULL). Same extra-null semantics
    * as dotFF.
    */
  def cosineFF(a: ArrayData, aD: Boolean, b: ArrayData, bD: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elem(a, i, aD)
      val y = elem(b, i, bD)
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    val den = math.sqrt(aa) * math.sqrt(bb)
    if (den == 0.0) 0.0 else ab / den
  }

  /** sum_i (a[i]-b[i])^2, elements widened to double; same null
    * semantics as dotFF
    */
  def l2FD(a: ArrayData, aD: Boolean, b: ArrayData, bD: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = elem(a, i, aD) - elem(b, i, bD)
      acc += d * d
      i += 1
    }
    acc
  }

  /** true iff the expression's type is array-of-double (vs float) —
    * the static per-side constant the kernels branch on
    */
  def isDoubleElem(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
    case _ => false
  }
}

/** `graft_lsh_sig(array<float>) -> int`, codegen'd: the LshSig.Bits-plane
  * sign signature of EmbQueries (weight at dim i, plane j =
  * ((i*(73+31j) + 151j) % 997) % 5 - 2, i 1-based), each plane dot
  * summed in-order in double like the SQL twin. NULL unless the input
  * is exactly LshSig.Dims non-null floats — ragged or null-element
  * input must surface as NULL (the VecDot convention), not as a
  * plausible signature.
  */
case class LshSig(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  private lazy val aD = VectorKernels.isDoubleElem(child)

  override def nullSafeEval(a: Any): Any =
    LshSig.sig(a.asInstanceOf[ArrayData], aD)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      java.lang.Integer ${ev.value}_r = graft.functions.LshSig.sig($a, $aD);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.intValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): LshSig =
    copy(child = newChild)

  override def prettyName: String = "graft_lsh_sig"
}

object LshSig {
  /** hyperplane count — THE tuning point: EmbQueries.SigBits derives
    * from here, so widening the signature changes kernel, banding and
    * oracle SQL together. 32 planes over 2x16-bit bands = 65,536 keys
    * per band (round 2 ran 16 planes / 2x8 bands = 256 keys; the wider
    * signature is the constants-scale-with-corpus demonstration).
    * Bit 31 makes the int signature negative half the time — every
    * band extraction must mask after shifting (shift-type-agnostic).
    */
  val Bits = 32

  /** fixed input dimensionality of the registered function */
  val Dims = 64

  /** weight table, precomputed once: W(j)(i-1) for plane j, dim i
    * (1-based i, the i*j cross term keeps planes distinct for every j)
    */
  private val W: Array[Array[Double]] =
    Array.tabulate(Bits, Dims)((j, i0) =>
      ((((i0 + 1) * (73 + 31 * j) + 151 * j) % 997) % 5 - 2).toDouble)

  def sig(a: ArrayData, aD: Boolean): java.lang.Integer = {
    if (a.numElements() != Dims) return null
    var i = 0
    while (i < Dims) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    var s = 0
    var j = 0
    while (j < Bits) {
      val w = W(j)
      var acc = 0.0
      var k = 0
      while (k < Dims) {
        acc += VectorKernels.elem(a, k, aD) * w(k)
        k += 1
      }
      if (acc >= 0) s |= 1 << j
      j += 1
    }
    s
  }

  def column(c: Column): Column =
    GraftSqlBridge.column(LshSig(GraftSqlBridge.expression(c)))
}

/** `graft_dot(array<float>, array<float>) -> double`, codegen'd.
  * Nullable beyond its inputs: ragged or null-element arrays yield NULL
  * (see VectorKernels.dotFF).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val aD = VectorKernels.isDoubleElem(left)
  private lazy val bD = VectorKernels.isDoubleElem(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotFF(a.asInstanceOf[ArrayData], aD,
      b.asInstanceOf[ArrayData], bD)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.VectorKernels.dotFF($a, $aD, $b, $bD);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object VecDot {
  def column(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      VecDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** `graft_cosine(array<float>, array<float>) -> double`, codegen'd:
  * one-pass safe cosine (see VectorKernels.cosineFF). Same extra-null
  * semantics as VecDot.
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val aD = VectorKernels.isDoubleElem(left)
  private lazy val bD = VectorKernels.isDoubleElem(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineFF(a.asInstanceOf[ArrayData], aD,
      b.asInstanceOf[ArrayData], bD)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.VectorKernels.cosineFF($a, $aD, $b, $bD);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

object VecCosine {
  def column(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      VecCosine(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** `graft_l2sq(array<float|double>, array<float|double>) -> double`,
  * codegen'd. Same extra-null semantics as VecDot.
  */
case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val aD = VectorKernels.isDoubleElem(left)
  private lazy val bD = VectorKernels.isDoubleElem(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.l2FD(a.asInstanceOf[ArrayData], aD,
      b.asInstanceOf[ArrayData], bD)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.VectorKernels.l2FD($a, $aD, $b, $bD);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_l2sq"
}

object VecL2Sq {
  def column(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      VecL2Sq(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** `graft_sq_maxabs(array<float>) -> double`, codegen'd: the int8
  * scalar-quantizer's per-vector scale — max |x| over exactly 64
  * non-null floats, each widened to double; NULL for ragged or
  * null-element input (the LshSig strict contract). Math.max matches
  * Spark array_max's ordering on the two edge values that differ
  * across orderings (NaN greatest, 0.0 > -0.0), so the value is
  * bit-identical to array_max(transform(abs(...))).
  */
case class SqMaxAbs(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val aD = VectorKernels.isDoubleElem(child)

  override def nullSafeEval(a: Any): Any =
    SqMaxAbs.maxAbs(a.asInstanceOf[ArrayData], aD)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      java.lang.Double ${ev.value}_r = graft.functions.SqMaxAbs.maxAbs($a, $aD);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): SqMaxAbs =
    copy(child = newChild)

  override def prettyName: String = "graft_sq_maxabs"
}

object SqMaxAbs {
  val Dims = 64

  def maxAbs(a: ArrayData, aD: Boolean): java.lang.Double = {
    if (a.numElements() != Dims) return null
    var i = 0
    while (i < Dims) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    var m = 0.0
    i = 0
    while (i < Dims) {
      m = math.max(m, math.abs(VectorKernels.elem(a, i, aD)))
      i += 1
    }
    m
  }

  def column(c: Column): Column =
    GraftSqlBridge.column(SqMaxAbs(GraftSqlBridge.expression(c)))
}

/** `graft_sq_qdot(array<float>, array<int>) -> long`, codegen'd: the
  * int8-code dot against a pre-quantized query code in ONE pass —
  * quantize each element (code_i = round-half-up(x_i·127/ma) as the
  * Round expression computes it: BigDecimal on the double's shortest
  * decimal repr, NaN/Inf passed through then int-cast like a non-ANSI
  * double->int cast) and accumulate code_i·qcode_i in long, WITHOUT
  * materializing the code array. Replaces the interpreted
  * transform + zip_with + aggregate chain (three per-element HOF
  * evaluations per row — BENCH_r06 showed ~2.5 s/query at sf0.1 for
  * what is one narrow map). NULL for ragged/null-element vectors (the
  * quantizer contract); ma = 0 yields the all-zero code, dot 0,
  * exactly like the column form. VectorKernelsSpec pins equality
  * against the HOF lineage.
  */
case class SqQDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  private lazy val aD = VectorKernels.isDoubleElem(left)

  override def nullSafeEval(a: Any, b: Any): Any =
    SqQDot.qdot(a.asInstanceOf[ArrayData], aD, b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_r = graft.functions.SqQDot.qdot($a, $aD, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqQDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sq_qdot"
}

object SqQDot {
  val Scale = 127

  /** Spark Round(d, 0) for DoubleType, exactly: BigDecimal.valueOf
    * (shortest decimal repr — NOT |d|+0.5, whose IEEE addition rounds
    * 0.49999999999999994 up to 1), HALF_UP, NaN/Infinity pass through.
    */
  private def round0(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  /** non-ANSI double->int cast (NaN -> 0, +/-Inf -> Int.Max/Min) is
    * exactly Scala's toInt
    */
  def qdot(a: ArrayData, aD: Boolean, qcode: ArrayData): java.lang.Long = {
    val ma = SqMaxAbs.maxAbs(a, aD)
    if (ma == null || qcode.numElements() != SqMaxAbs.Dims) return null
    val m = ma.doubleValue()
    var acc = 0L
    var i = 0
    while (i < SqMaxAbs.Dims) {
      if (qcode.isNullAt(i)) return null
      val code =
        if (m == 0.0) 0
        else round0(VectorKernels.elem(a, i, aD) * Scale / m).toInt
      acc += (code * qcode.getInt(i)).toLong
      i += 1
    }
    acc
  }

  def column(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      SqQDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** `graft_sign_bits(array<float|double>) -> array<bigint>` of exactly
  * two elements [h1, h2]: the 1-bit sign bitmap of emb_bq_ann packed
  * into two 32-bit halves (dims 0..31 -> h1 bit i, dims 32..63 -> h2
  * bit i-32 — two halves so no engine ever shifts into the int64 sign
  * bit). Codegen'd single pass replacing the interpreted
  * aggregate(transform(sequence...)) SQL form (higher-order functions
  * evaluate per element on the interpreted path). Semantics match that
  * SQL form EXACTLY, element by element: a missing (ragged) or NULL
  * dimension contributes bit 0 (try_element_at NULL -> false branch),
  * a NULL input array packs to [0, 0], and the comparison is Spark's
  * NaN-is-largest float ordering (`v > 0f` is true for NaN), which
  * java.lang.Double.compare reproduces. VectorKernelsSpec pins kernel
  * == SQL-expression equality over adversarial inputs.
  */
case class SignBits(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = false

  private lazy val aD = VectorKernels.isDoubleElem(child)

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any =
    SignBits.pack(child.eval(input).asInstanceOf[ArrayData], aD)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.SignBits.pack(
            ${c.isNull} ? null : ${c.value}, $aD);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)

  override def prettyName: String = "graft_sign_bits"
}

object SignBits {
  def pack(a: ArrayData, aD: Boolean): ArrayData = {
    var h1 = 0L
    var h2 = 0L
    val n = if (a == null) 0 else math.min(a.numElements(), 64)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = VectorKernels.elem(a, i, aD)
        // Double.compare treats NaN as greater than any value — the
        // same NaN-is-largest ordering Spark's float `>` uses
        if (java.lang.Double.compare(v, 0.0) > 0) {
          if (i < 32) h1 |= 1L << i
          else h2 |= 1L << (i - 32)
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(h1, h2))
  }

  def column(c: Column): Column =
    GraftSqlBridge.column(SignBits(GraftSqlBridge.expression(c)))
}

/** `graft_int_dot(array<int>, array<int>) -> bigint`, codegen'd: the
  * integer code dot the PERSISTED int8-SQ artifact serves with
  * (emb_sq_served) — all-integer, overflow-free for |code| <= 127 at
  * any realistic dimension. NULL on length mismatch or a null element
  * (a corrupt code row must surface as NULL, never flow through as a
  * plausible partial dot), matching the aggregate(zip_with(...)) fold
  * the oracle SQL expresses.
  */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    IntDot.dotII(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_r = graft.functions.IntDot.dotII($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_int_dot"
}

object IntDot {
  def dotII(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getInt(i).toLong * b.getInt(i)
      i += 1
    }
    acc
  }

  def column(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      IntDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
