package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the property the ulp-immune mean (EmbQueries.mean6Expr) was
  * introduced for and that round(avg(double), 6) provably lacks: EXACT
  * bit-equality across partition counts (i.e. accumulation orders),
  * while staying within one grid step of the true mean. round-4's
  * emb_drift_by_label hash failure was precisely a partial-aggregation-
  * order ulp landing the mean on the other side of a 5e-7 boundary.
  */
class Mean6Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mean6 is bit-identical across partitionings and ~1e-6 of the mean") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val grouped = Seq.fill(10000)(rnd.nextFloat() - 0.5f)
      .zipWithIndex.map { case (v, i) => (i % 7, v) }
    def mean6Of(parts: Int): Map[Int, Double] =
      grouped.toDF("g", "v").repartition(parts)
        .withColumn("vi", graft.queries.EmbQueries.snap6(col("v")))
        .groupBy("g")
        .agg(expr(graft.queries.EmbQueries.mean6Expr("vi")).as("m"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val a = mean6Of(1)
    val b = mean6Of(13)
    val c = mean6Of(32)
    assert(a == b && b == c) // exact double equality, any partition order
    val avgRef = grouped.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2.toDouble).sum / vs.size
    }
    // per-value grid snap moves each input <= 5e-7, so the mean moves
    // <= 5e-7, and the 6-dp mean rounding adds <= 5e-7 more
    for ((g, m) <- a)
      assert(math.abs(m - avgRef(g)) <= 1.000001e-6, s"group $g: $m")
  }

  test("mean6 degrades like avg: all-null group yields NULL") {
    import spark.implicits._
    val df = Seq((0, Some(1.25f)), (0, Some(0.75f)), (1, None))
      .toDF("g", "v")
      .withColumn("vi", graft.queries.EmbQueries.snap6(col("v")))
      .groupBy("g")
      .agg(expr(graft.queries.EmbQueries.mean6Expr("vi")).as("m"))
    val rows = df.collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(rows(0) == Some(1.0))
    assert(rows(1).isEmpty)
  }
}
