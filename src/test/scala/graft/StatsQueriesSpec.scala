package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent (plain-Scala double) recomputation of the round-7
  * statistical queries — Welch t², CUSUM changepoint, lag-1
  * autocorrelation — against their exact-integer engine forms. The
  * DuckDB oracle proves cross-engine agreement; this spec proves the
  * integer-staged arithmetic actually computes the STATISTIC (the two
  * could agree on a wrong formula).
  */
class StatsQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private lazy val events: Seq[(String, Long, Double)] = {
    import org.apache.spark.sql.functions._
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("value").isNotNull &&
        col("event_type").isNotNull)
      .select(col("event_type"), col("ts").cast("long"),
        col("value").cast("double"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
  }

  test("ev_welch_ttest matches a double-precision Welch computation") {
    val rows = Registry.byName("ev_welch_ttest").build(spark, dir).collect()
    assert(rows.nonEmpty)
    val byType = events.groupBy(_._1).map { case (t, xs) =>
      val v = xs.map(x => math.round(x._3 * 1e6) / 1e6) // same 1e6 grid
      val n = v.size.toDouble
      val m = v.sum / n
      val s2 = v.map(x => (x - m) * (x - m)).sum / (n - 1)
      t -> (n, m, s2)
    }
    for (r <- rows) {
      val (na, ma, va) = byType(r.getString(0))
      val (nb, mb, vb) = byType(r.getString(1))
      val t2 = (ma - mb) * (ma - mb) / (va / na + vb / nb)
      val got = r.getLong(5) / 1000.0
      // staged truncating division: each of the 4 divs floors at its
      // scale; the compounded error stays well under 1% + 2 milli here
      assert(math.abs(got - t2) <= t2 * 0.01 + 0.002,
        s"${r.getString(0)}/${r.getString(1)}: engine $got vs double $t2")
      assert(r.getBoolean(6) == (r.getLong(5) >= 3842))
    }
  }

  test("ev_cusum_changepoint matches a double-precision CUSUM scan") {
    val rows =
      Registry.byName("ev_cusum_changepoint").build(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val t = r.getString(0)
      val daily = events.filter(_._1 == t)
        .groupBy(x => x._2 / 86400L)
        .map { case (d, xs) =>
          (d, xs.size.toLong, xs.map(x => math.round(x._3 * 1e6)).sum)
        }
        .toSeq.sortBy(_._1)
      val nn = daily.map(_._2).sum
      val tt = daily.map(_._3.toDouble).sum
      var run = 0.0
      var best = (0.0, Long.MaxValue)
      for ((d, ni, si) <- daily) {
        run += si * nn - tt * ni
        val a = math.abs(run)
        if (a > best._1 + 0.5) best = (a, d)
      }
      assert(r.getLong(1) == daily.size, s"$t n_days")
      assert(r.getLong(2) == best._2, s"$t changepoint day")
      val expMicro = best._1 / nn
      assert(math.abs(r.getLong(3) - expMicro) <= 1 + expMicro * 1e-9,
        s"$t cusum micro: ${r.getLong(3)} vs $expMicro")
    }
  }

  test("ev_autocorr_daily matches a double-precision Pearson r1") {
    val rows =
      Registry.byName("ev_autocorr_daily").build(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val t = r.getString(0)
      val daily = events.filter(_._1 == t)
        .groupBy(x => x._2 / 86400L).map { case (d, xs) => d -> xs.size }
      val pairs = daily.toSeq
        .flatMap { case (d, x) => daily.get(d + 1).map(x1 => (x, x1)) }
      assert(r.getLong(1) == pairs.size, s"$t n_pairs")
      val m = pairs.size.toDouble
      val (sx, sy) = (pairs.map(_._1).sum.toDouble,
        pairs.map(_._2).sum.toDouble)
      val num = m * pairs.map(p => p._1.toDouble * p._2).sum - sx * sy
      val dx = m * pairs.map(p => p._1.toDouble * p._1).sum - sx * sx
      val dy = m * pairs.map(p => p._2.toDouble * p._2).sum - sy * sy
      if (dx <= 0 || dy <= 0) assert(r.isNullAt(2), s"$t: expected null")
      else {
        val exp = num / math.sqrt(dx * dy)
        assert(math.abs(r.getDouble(2) - exp) <= 1e-6, s"$t r1")
        assert(math.abs(r.getDouble(2)) <= 1.0)
      }
    }
  }
}
