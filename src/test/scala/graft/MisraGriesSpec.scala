package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MisraGriesAgg

/** Misra-Gries laws the doc_mg_heavy_hitters oracle gates on: the
  * summary never overstates a count, understates by at most N/(k+1),
  * stays within k entries, and keeps all three properties under
  * ARBITRARY merge trees (the mergeable-summaries theorem partial
  * aggregation relies on — reduce order and merge split must not break
  * the guarantee even though they change the summary's content).
  */
class MisraGriesSpec extends AnyFunSuite {

  private val K = 4
  private val agg = new MisraGriesAgg(K)

  // small alphabet => real heavy hitters and real counter evictions
  private val genTerm: Gen[String] = Gen.frequency(
    (5, Gen.const("a")), (3, Gen.const("b")), (2, Gen.const("c")),
    (1, Gen.oneOf("d", "e", "f", "g", "h")))

  private def exact(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def check(xs: Seq[String], summary: Map[String, Long]): Prop = {
    val ex = exact(xs)
    val n = xs.size.toLong
    val sizeOk = summary.size <= K
    val upperOk = summary.forall { case (t, c) => c <= ex.getOrElse(t, 0L) }
    val deficitOk = ex.forall { case (t, cnt) =>
      (cnt - summary.getOrElse(t, 0L)) * (K + 1) <= n
    }
    Prop(sizeOk && upperOk && deficitOk) :| s"summary=$summary exact=$ex"
  }

  test("sequential reduce keeps the MG guarantee") {
    val prop = Prop.forAll(Gen.listOf(genTerm)) { xs =>
      check(xs, xs.foldLeft(agg.zero)(agg.reduce))
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(r.passed, r.status.toString)
  }

  test("any 3-way merge tree keeps the MG guarantee") {
    val prop = Prop.forAll(
      Gen.listOf(genTerm), Gen.chooseNum(0, 1000), Gen.chooseNum(0, 1000)) {
      (xs, c1, c2) =>
        val i = if (xs.isEmpty) 0 else c1 % (xs.size + 1)
        val (l, rest) = xs.splitAt(i)
        val j = if (rest.isEmpty) 0 else c2 % (rest.size + 1)
        val (m, rr) = rest.splitAt(j)
        val part = List(l, m, rr).map(_.foldLeft(agg.zero)(agg.reduce))
        // left-leaning and right-leaning merge trees must BOTH hold
        val leftTree = agg.merge(agg.merge(part(0), part(1)), part(2))
        val rightTree = agg.merge(part(0), agg.merge(part(1), part(2)))
        check(xs, leftTree) && check(xs, rightTree)
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(r.passed, r.status.toString)
  }

  test("a true majority item always survives with a positive counter") {
    // n("a") > n/(K+1) forces presence per the deficit bound
    val xs = Seq.fill(60)("a") ++ Seq.tabulate(40)(i => s"t${i % 8}")
    val summary = xs.foldLeft(agg.zero)(agg.reduce)
    assert(summary.contains("a"))
    assert(summary("a") <= 60L)
    assert(60L - summary("a") <= xs.size.toLong / (K + 1))
  }
}
