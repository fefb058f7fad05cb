package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact integer second-moment (Gram) accumulator over strict 64-dim
  * vectors on the 1e6 grid: n, per-dim sums Σvᵢ, and upper-triangle
  * pair sums Σvᵢvⱼ — everything a covariance / whitening / PCA step
  * needs, in ONE pass with a fixed-size mergeable buffer.
  *
  * This replaces the dims²/2-per-row pair EXPLOSION (measured 7.5 s at
  * sf0.1 — 10M exploded rows through a hash aggregate) with the shape
  * that is right at any scale: each partition folds its rows into one
  * (64 + 2016)-cell long buffer, the exchange moves partitions × 1
  * buffers, and merge is pointwise addExact. The grid snap is the
  * shared snap6 semantics (Spark Round HALF_UP via BigDecimal on the
  * double's shortest decimal repr — NOT +0.5, which rounds
  * 0.49999999999999994 wrong). Sums use Math.addExact /
  * Math.multiplyExact so int64 wrap is LOUD (ArithmeticException), the
  * aggregator-buffer analogue of the DECIMAL(38,0) loud-NULL
  * convention in the column-form queries.
  */
class GramAgg extends Aggregator[Array[Double], GramAgg.Buf, GramAgg.Buf] {
  import GramAgg._

  override def zero: Buf =
    Buf(0L, new Array[Long](D), new Array[Long](P), new Array[Long](D))

  // Array[Double] input (the caller widens float embeddings — lossless
  // per IEEE, and a future double-element testdata regen is then a
  // no-op here, the same insurance as the element-type-adaptive
  // VectorKernels)
  override def reduce(b: Buf, a: Array[Double]): Buf = {
    if (a == null || a.length != D) return b
    val v = new Array[Long](D)
    var i = 0
    while (i < D) { v(i) = snap6(a(i)); i += 1 }
    i = 0
    var k = 0
    while (i < D) {
      b.s(i) = Math.addExact(b.s(i), v(i))
      b.q(i) = Math.addExact(b.q(i), Math.multiplyExact(v(i), v(i)))
      var j = i + 1
      while (j < D) {
        b.p(k) = Math.addExact(b.p(k), Math.multiplyExact(v(i), v(j)))
        j += 1; k += 1
      }
      i += 1
    }
    Buf(b.n + 1, b.s, b.p, b.q)
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    var i = 0
    while (i < D) {
      b1.s(i) = Math.addExact(b1.s(i), b2.s(i))
      b1.q(i) = Math.addExact(b1.q(i), b2.q(i))
      i += 1
    }
    var k = 0
    while (k < P) { b1.p(k) = Math.addExact(b1.p(k), b2.p(k)); k += 1 }
    Buf(b1.n + b2.n, b1.s, b1.p, b1.q)
  }

  override def finish(reduction: Buf): Buf = reduction

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
}

object GramAgg {
  val D = 64
  val P: Int = D * (D - 1) / 2

  /** n rows folded, s = per-dim Σvᵢ (length D), p = upper-triangle
    * Σvᵢvⱼ in row-major (i, j>i) order (length P), q = diagonal Σvᵢ²
    * (length D) — q completes the second-moment matrix so one buffer
    * serves covariance AND the PCA power iteration
    */
  final case class Buf(n: Long, s: Array[Long], p: Array[Long],
      q: Array[Long])

  /** pair index of (i, j), i < j, in the row-major upper triangle */
  def pairIndex(i: Int, j: Int): Int = i * (2 * D - i - 1) / 2 + (j - i - 1)

  /** Spark Round(d*1e6, 0) for DoubleType, exactly (see SqQDot.round0) */
  def snap6(v: Double): Long = {
    val d = v * 1e6
    if (java.lang.Double.isNaN(d)) 0L
    else if (java.lang.Double.isInfinite(d))
      if (d > 0) Long.MaxValue else Long.MinValue
    else java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
  }
}
