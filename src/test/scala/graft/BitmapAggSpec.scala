package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BitmapBuildAgg

class BitmapAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bitmap distinct matches countDistinct on skewed ids") {
    val agg = new BitmapBuildAgg()
    // ids straddle word boundaries (63/64) and repeat heavily
    val ids = Seq(0L, 1L, 63L, 64L, 65L, 127L, 128L, 1000L, 0L, 64L, 1000L)
    val df = ids.toDF("id")
    val bmUdaf = udaf(agg)
    val got = df.agg(bmUdaf(col("id")).as("bm"))
      .select(aggregate(col("bm"), lit(0L),
        (acc, w) => acc + bit_count(w).cast("long")).as("n"))
      .head().getLong(0)
    assert(got == ids.distinct.size)
  }

  test("merge ORs unequal-length partials without losing high words") {
    val agg = new BitmapBuildAgg()
    val small = agg.reduce(agg.zero, 3L)
    val big = agg.reduce(agg.zero, 500L)
    val m1 = agg.merge(big.clone(), small.clone())
    val m2 = agg.merge(small.clone(), big.clone())
    def bits(b: Array[Long]): Set[Long] =
      (for {
        (w, i) <- b.zipWithIndex
        j <- 0 until 64 if (w & (1L << j)) != 0
      } yield i.toLong * 64 + j).toSet
    assert(bits(m1) == Set(3L, 500L))
    assert(bits(m2) == Set(3L, 500L))
  }

  test("negative ids are rejected, empty group popcounts to zero") {
    val agg = new BitmapBuildAgg()
    intercept[IllegalArgumentException](agg.reduce(agg.zero, -1L))
    assert(agg.finish(agg.zero).isEmpty)
  }

  test("grouped query form is partial+final (no Expand)") {
    val p = Registry.byName("ev_bitmap_distinct")
      .build(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), p.take(600))
    assert(p.contains("partial_bitmapbuildagg") ||
      "HashAggregate|ObjectHashAggregate".r.findAllIn(p).size >= 2,
      p.take(900))
  }
}
