package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder

/** The magic-mask interleave must equal the bit-by-bit reference, and
  * the curve must actually deliver locality (prefix-sharing keys sit in
  * bounded dimension ranges).
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("column interleave == bit-by-bit reference on seeded random keys") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val keys = Seq.fill(500)((rnd.nextInt(65536), rnd.nextInt(65536))) ++
      Seq((0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2))
    val got = keys.toDF("x", "y")
      .select(ZOrder.zorder32(col("x").cast("long"), col("y").cast("long")))
      .collect().map(_.getLong(0))
    val want = keys.map { case (x, y) => ZOrder.reference(x, y) }
    assert(got.toSeq == want)
  }

  test("dimensions recover from alternate bits (round trip)") {
    val rnd = new scala.util.Random(11)
    (0 until 200).foreach { _ =>
      val (x, y) = (rnd.nextInt(65536), rnd.nextInt(65536))
      val z = ZOrder.reference(x, y)
      val rx = (0 until 16).map(b => (((z >> (2 * b)) & 1) << b).toInt).sum
      val ry = (0 until 16).map(b => (((z >> (2 * b + 1)) & 1) << b).toInt).sum
      assert(rx == x && ry == y)
    }
  }

  test("a shared z-prefix bounds BOTH dimension ranges") {
    // 8 shared prefix bits = 4 interleaved bits per dimension pinned =>
    // each dimension varies over at most 2^12 within the bucket
    val rnd = new scala.util.Random(13)
    val pts = Seq.fill(4000)((rnd.nextInt(65536), rnd.nextInt(65536)))
    pts.groupBy { case (x, y) => ZOrder.reference(x, y) >> 24 }
      .foreach { case (_, members) =>
        val xs = members.map(_._1)
        val ys = members.map(_._2)
        assert(xs.max - xs.min < 4096, s"x-range too wide: $xs")
        assert(ys.max - ys.min < 4096, s"y-range too wide: $ys")
      }
  }

  test("SQL twin text == column form through Spark SQL") {
    import spark.implicits._
    val df = Seq((123L, 456L), (65535L, 1L), (0L, 0L)).toDF("x", "y")
    df.createOrReplaceTempView("zin")
    val viaSql = spark.sql(
      s"SELECT ${ZOrder.zorder32Sql("x", "y")} AS z FROM zin")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(ZOrder.zorder32(col("x"), col("y")))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol)
  }
}
