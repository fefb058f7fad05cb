package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GramAgg

/** GramAgg laws: the JVM grid snap is bit-identical to the column-form
  * snap6 (round(x*1e6, 0) cast long — the convention every emb query
  * shares), the one-pass sums equal the brute-force definition, and
  * merge over any split equals the whole (the partial-agg property).
  */
class GramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("JVM snap6 matches the Spark column form bit-for-bit") {
    // adversarial grid: exact halves, shortest-repr traps like
    // 0.49999999999999994, denormal-ish smalls, and plain values
    val vals: Seq[Float] = Seq(
      0.0f, -0.0f, 0.5e-6f, -0.5e-6f, 1.5e-6f, -1.5e-6f, 0.1f, -0.1f,
      0.125f, 0.3333333f, -0.9999999f, 1.0f, -1.0f, 0.49999997f,
      Float.MinPositiveValue, 3.4e2f)
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      vals.map(v => org.apache.spark.sql.Row(v)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.FloatType))))
    val sparkSide = df
      .select(round(col("v").cast("double") * 1e6, 0).cast("long").as("s"))
      .collect().map(_.getLong(0))
    // the query side widens float embeddings to double before the udaf;
    // .toDouble here is that same (lossless) widening
    val jvmSide = vals.map(v => GramAgg.snap6(v.toDouble))
    assert(sparkSide.toSeq == jvmSide.toSeq)
  }

  private val genVec: Gen[Array[Double]] =
    Gen.containerOfN[Array, Double](GramAgg.D,
      Gen.chooseNum(-1.0, 1.0).map(f => math.rint(f * 8) / 8))

  private def brute(vs: Seq[Array[Double]])
      : (Long, Array[Long], Array[Long], Array[Long]) = {
    val D = GramAgg.D
    val s = new Array[Long](D)
    val p = new Array[Long](GramAgg.P)
    val q = new Array[Long](D)
    vs.foreach { a =>
      val v = a.map(GramAgg.snap6)
      for (i <- 0 until D) {
        s(i) += v(i)
        q(i) += v(i) * v(i)
        for (j <- i + 1 until D)
          p(GramAgg.pairIndex(i, j)) += v(i) * v(j)
      }
    }
    (vs.size.toLong, s, p, q)
  }

  test("one-pass fold equals the brute-force definition; merge of any split equals whole") {
    val agg = new GramAgg()
    val prop = Prop.forAll(Gen.listOfN(6, genVec), Gen.chooseNum(0, 100)) {
      (vs, cut) =>
        val whole = vs.foldLeft(agg.zero)(agg.reduce)
        val (bn, bs, bp, bq) = brute(vs)
        val k = if (vs.isEmpty) 0 else cut % (vs.size + 1)
        val (l, r) = vs.splitAt(k)
        val merged = agg.merge(
          l.foldLeft(agg.zero)(agg.reduce),
          r.foldLeft(agg.zero)(agg.reduce))
        whole.n == bn && whole.s.sameElements(bs) &&
          whole.p.sameElements(bp) && whole.q.sameElements(bq) &&
          merged.n == bn && merged.s.sameElements(bs) &&
          merged.p.sameElements(bp) && merged.q.sameElements(bq)
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(r.passed, r.status.toString)
  }
}
