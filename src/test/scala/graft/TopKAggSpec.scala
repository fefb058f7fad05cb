package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ScoredId, TopKAgg}

/** TopKAgg laws: equivalence to sort-take, merge associativity with
  * arbitrary partial splits (the property partial aggregation relies on).
  */
class TopKAggSpec extends AnyFunSuite {

  private val agg = new TopKAgg(3)

  private def reference(xs: Seq[ScoredId]): List[ScoredId] =
    xs.sortBy(s => (-s.score, s.id)).take(3).toList

  private val genScored: Gen[ScoredId] = for {
    sc <- Gen.chooseNum(-1.0, 1.0)
    id <- Gen.chooseNum(0L, 50L)
  } yield ScoredId(math.rint(sc * 100) / 100, id) // coarse => real ties

  test("reduce-fold equals sort-take reference") {
    val prop = Prop.forAll(Gen.listOf(genScored)) { xs =>
      xs.foldLeft(agg.zero)(agg.reduce) == reference(xs)
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("merge of any split equals whole — partial-agg correctness") {
    val prop = Prop.forAll(Gen.listOf(genScored), Gen.chooseNum(0, 100)) {
      (xs, cut) =>
        val k = if (xs.isEmpty) 0 else cut % (xs.size + 1)
        val (l, r) = xs.splitAt(k)
        val merged = agg.merge(
          l.foldLeft(agg.zero)(agg.reduce),
          r.foldLeft(agg.zero)(agg.reduce))
        merged == reference(xs)
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }
}
