package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard: the properties SCALE.md claims must stay
  * visible in the executed plans. Bench seconds vary with box load;
  * these assertions are the stable perf signal.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    Registry.byName(name).build(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString

  test("star_q5: all dimension joins broadcast") {
    val p = plan("star_q5_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(400))
    assert(!p.contains("SortMergeJoin"))
  }

  test("top-k queries plan TakeOrderedAndProject, not a global sort") {
    assert(plan("doc_topk_longest").contains("TakeOrderedAndProject"))
    assert(plan("ev_topk_recent").contains("TakeOrderedAndProject"))
    assert(plan("emb_knn_cosine").contains("TakeOrderedAndProject"))
  }

  test("aggregations are partial+final (map-side combine)") {
    assert(plan("star_q1_pricing").contains("partial_sum"))
    assert(plan("doc_sentiment_counts").contains("partial_count"))
  }

  test("predicates reach the parquet scan") {
    val p = plan("star_filter_pushdown")
    assert(p.contains("StartsWith") && p.contains("IN (F,O)"), p.take(600))
  }

  test("salted agg is genuinely two-phase") {
    val p = plan("ev_salted_agg")
    assert("HashAggregate".r.findAllIn(p).size == 4, p.take(400))
  }

  test("column pruning: sentiment counts scan reads only text") {
    val p = plan("doc_sentiment_counts")
    assert(p.contains("ReadSchema: struct<text:string>"), p.take(600))
  }
}
