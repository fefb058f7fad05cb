package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

/** The banded range join must return exactly what the raw inequality
  * join returns, while planning a hash join instead of the nested loop
  * the raw predicate forces.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val events = // nanos-timestamp table: always via Tables.events
    Tables.events(spark, TestSpark.sf0001).select("event_id", "value")
  private lazy val bands = spark.range(20)
    .select(col("id").as("range_id"),
      (col("id") * lit(5)).cast("double").as("lo"),
      ((col("id") * lit(5)).cast("double") + 7.5).as("hi"))

  test("banded result == naive inequality-join result") {
    val banded = RangeJoin
      .bucketed(events, bands, "value", "lo", "hi", width = 5.0)
      .select("event_id", "range_id")
    val naive = events.join(bands,
        col("value") >= col("lo") && col("value") <= col("hi"))
      .select("event_id", "range_id")
    assert(banded.count() > 0)
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
  }

  test("banding replaces the nested-loop join with a hash join") {
    val naivePlan = events.join(bands,
        col("value") >= col("lo") && col("value") <= col("hi"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("NestedLoopJoin"), naivePlan.take(400))

    val bandedPlan = RangeJoin
      .bucketed(events, bands, "value", "lo", "hi", width = 5.0)
      .queryExecution.executedPlan.toString
    assert(!bandedPlan.contains("NestedLoopJoin"), bandedPlan.take(800))
    assert(bandedPlan.contains("HashJoin") ||
      bandedPlan.contains("SortMergeJoin"), bandedPlan.take(800))
  }

  test("nulls and out-of-band points never match") {
    import spark.implicits._
    val pts = Seq[(Long, java.lang.Double)](
      (1L, 2.0), (2L, null), (3L, -1.0), (4L, 1e9))
      .toDF("id", "value")
    val r = RangeJoin.bucketed(pts, bands, "value", "lo", "hi", 5.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(r == Set(1L))
  }
}
