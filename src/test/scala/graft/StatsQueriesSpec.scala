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

  test("ev_hist_quantile_merge: estimate within one bin of the exact median") {
    val rows =
      Registry.byName("ev_hist_quantile_merge").build(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val t = r.getString(0)
      val v = events.filter(_._1 == t).map(_._3).sorted
      assert(r.getLong(1) == v.size, s"$t n")
      val exactLo = v((v.size - 1) / 2) // lower middle order statistic
      val est = r.getLong(3) / 1e6
      // the estimate interpolates inside the rank-k bin, so it can
      // never be more than one 8-unit bin from the k-th value
      assert(math.abs(est - exactLo) <= 8.0 + 1e-6,
        s"$t: est $est vs exact-lo $exactLo")
    }
  }

  test("ev_value_median_exact returns the true middle order statistics") {
    val r =
      Registry.byName("ev_value_median_exact").build(spark, dir).collect()
    assert(r.length == 1)
    val v = events.map(x => math.round(x._3 * 1e6)).sorted
    // spec loads only ts/type/value-non-null rows; the query filters
    // value only — recompute from the query's own population
    import org.apache.spark.sql.functions._
    val vv = Tables.events(spark, dir).filter(col("value").isNotNull)
      .select(round(col("value").cast("double") * 1e6, 0).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = vv.length
    assert(r(0).getLong(0) == n)
    assert(r(0).getLong(1) == vv((n + 1) / 2 - 1), "lo order statistic")
    assert(r(0).getLong(2) == vv(n / 2), "hi order statistic")
    assert(v.nonEmpty) // silence unused warning path
  }

  test("ev_ab_conversion_ztest matches a double-precision pooled z^2") {
    val r = Registry.byName("ev_ab_conversion_ztest")
      .build(spark, dir).collect()
    assert(r.length == 1)
    import org.apache.spark.sql.functions._
    val pu = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(count(when(col("event_type") === "purchase", 1)).as("np"))
      .collect().map(x => (x.getLong(0), x.getLong(1) >= 14))
    val (a, b) = pu.partition(_._1 % 2 == 0)
    val (na, nb) = (a.length.toDouble, b.length.toDouble)
    val (ca, cb) = (a.count(_._2).toDouble, b.count(_._2).toDouble)
    assert(r(0).getLong(0) == na.toLong && r(0).getLong(1) == nb.toLong)
    assert(r(0).getLong(2) == ca.toLong && r(0).getLong(3) == cb.toLong)
    val p = (ca + cb) / (na + nb)
    if (p == 0 || p == 1 || na == 0 || nb == 0) assert(r(0).isNullAt(4))
    else {
      val z2 = math.pow(ca / na - cb / nb, 2) /
        (p * (1 - p) * (1 / na + 1 / nb))
      val got = r(0).getLong(4) / 1000.0
      assert(math.abs(got - z2) <= z2 * 0.001 + 0.002,
        s"engine $got vs double $z2")
      assert(r(0).getBoolean(5) == (r(0).getLong(4) >= 3842))
    }
  }

  test("ev_mann_whitney matches a double-precision midrank U and z^2") {
    val r =
      Registry.byName("ev_mann_whitney").build(spark, dir).collect()
    assert(r.length == 1)
    import org.apache.spark.sql.functions._
    val pool = Tables.events(spark, dir)
      .filter(col("value").isNotNull &&
        col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        round(col("value").cast("double") * 1e6, 0).cast("long").as("vi"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val n1 = pool.count(_._1 == "click").toDouble
    val n2 = pool.count(_._1 == "purchase").toDouble
    assert(r(0).getLong(0) == n1.toLong && r(0).getLong(1) == n2.toLong)
    // midranks: sort pooled values, average rank within tie blocks
    val sorted = pool.sortBy(_._2)
    val midrank = sorted.groupBy(_._2).map { case (v, xs) =>
      val idxs = sorted.zipWithIndex.filter(_._1._2 == v).map(_._2 + 1)
      v -> idxs.sum.toDouble / idxs.size
    }
    val r1 = pool.filter(_._1 == "click").map(x => midrank(x._2)).sum
    val u = r1 - n1 * (n1 + 1) / 2
    assert(math.abs(r(0).getLong(2) / 2.0 - u) <= 1e-6, s"U: ${r(0)}")
    val nn = n1 + n2
    val ties = sorted.groupBy(_._2).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val v = n1 * n2 / 12 * ((nn + 1) - ties / (nn * (nn - 1)))
    val z2 = (u - n1 * n2 / 2) * (u - n1 * n2 / 2) / v
    val got = r(0).getLong(3) / 1000.0
    assert(math.abs(got - z2) <= z2 * 0.01 + 0.002,
      s"z2 engine $got vs double $z2")
  }

  test("ev_ab_report's conversion lens equals the standalone z-test") {
    val rep = Registry.byName("ev_ab_report").build(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None
        else Some(r.getLong(3)))).toMap
    assert(rep.keySet == Set("conversion", "mean_value", "rank_sum"))
    val zt = Registry.byName("ev_ab_conversion_ztest")
      .build(spark, dir).collect()(0)
    val (na, nb, z) = rep("conversion")
    assert(na == zt.getLong(0) && nb == zt.getLong(1))
    assert(z == (if (zt.isNullAt(4)) None else Some(zt.getLong(4))),
      "conversion lens drifted from ev_ab_conversion_ztest")
  }

  test("designed micro-corpus: tie-heavy Mann-Whitney and a planted changepoint") {
    import spark.implicits._
    // click values: heavy tie blocks {1.0 x 6, 2.0 x 4}; purchase:
    // {1.0 x 2, 2.0 x 6, 3.0 x 2} — midranks decide everything here.
    // Naive midrank math (pooled n=20): value 1.0 spans ranks 1..8
    // (midrank 4.5), 2.0 spans 9..18 (midrank 13.5), 3.0 spans 19..20
    // (midrank 19.5). R_click = 6*4.5 + 4*13.5 = 81; U = 81 -
    // n1(n1+1)/2 = 81 - 55 = 26; u2 = 52.
    val clicks = Seq.fill(6)(1.0) ++ Seq.fill(4)(2.0)
    val purchases = Seq.fill(2)(1.0) ++ Seq.fill(6)(2.0) ++
      Seq.fill(2)(3.0)
    // events at a planted mean shift: 'error' values 10.0 for days
    // 0..9 then 50.0 for days 10..19 — CUSUM must peak at the shift.
    // Timestamps from epoch millis (2024-01-01T00:00Z), NOT local wall
    // time, so the epoch_day assertion is timezone-independent.
    def ts(day: Int) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L)
    val rows =
      clicks.zipWithIndex.map { case (v, i) =>
        (i.toLong, ts(1), 1L, "click", v, "{}")
      } ++ purchases.zipWithIndex.map { case (v, i) =>
        (100L + i, ts(1), 2L, "purchase", v, "{}")
      } ++ (0 until 20).map { d =>
        (200L + d, ts(d), 3L, "error", if (d < 10) 10.0 else 50.0, "{}")
      } ++ (0 until 10).map { d =>
        // a PERFECT line for the regression pin: with x = seconds from
        // 2024-01-01 (= 86400*d) and micro-y = 2*x + 5e6, value =
        // 5 + 0.1728*d lands exactly on the 1e6 grid, so the closed
        // form must return slope_nano = 2000, intercept_micro = 5e6
        (300L + d, ts(d), 4L, "view", 5.0 + 0.1728 * d, "{}")
      } ++ (0 until 10).flatMap { d =>
        // alternating 1,2,1,2,... daily counts: every lag-1 pair is
        // (1,2) or (2,1), a perfect negative correlation -> r1 = -1
        (0 until (1 + d % 2)).map { j =>
          (400L + d * 2 + j, ts(d), 5L, "signup", 1.0, "{}")
        }
      }
    val dir = java.nio.file.Files
      .createTempDirectory("stats_micro").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$dir/events.parquet")

    val mw = Registry.byName("ev_mann_whitney").build(spark, dir)
      .collect()(0)
    assert(mw.getLong(0) == 10 && mw.getLong(1) == 10)
    assert(mw.getLong(2) == 52, s"u2 with heavy ties: $mw")

    val cs = Registry.byName("ev_cusum_changepoint").build(spark, dir)
      .collect().find(_.getString(0) == "error").get
    // the max |cumulative deviation| of a clean two-level shift lands
    // on the last day of the first regime (day index 9 from epoch day
    // of 2024-01-01 = 19723)
    assert(cs.getLong(1) == 20, s"n_days: $cs")
    assert(cs.getLong(2) == 19723L + 9L, s"changepoint day: $cs")
    // |C_9| = N * |sum(first 10 days) - 10/20 * total| =
    // 20 * |100 - 300| * 1e6 micro / N -> reported micro = 200e6
    assert(cs.getLong(3) == 200000000L, s"cusum micro: $cs")

    val lr = Registry.byName("ev_linreg_by_type").build(spark, dir)
      .collect().find(_.getString(0) == "view").get
    assert(lr.getLong(1) == 10, s"linreg n: $lr")
    assert(lr.getLong(2) == 2000L, s"slope_nano on a perfect line: $lr")
    assert(lr.getLong(3) == 5000000L, s"intercept_micro: $lr")

    val ac = Registry.byName("ev_autocorr_daily").build(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(ac("signup").getDouble(2) == -1.0,
      s"alternating counts must give r1 = -1: ${ac("signup")}")
    // constant daily counts have zero variance -> NULL by contract
    assert(ac("error").isNullAt(2), s"constant series: ${ac("error")}")

    // histogram-quantile interpolation pin: 'error' is 10x10.0 +
    // 10x50.0 -> bins 1 (vi 1e7 div 8e6) and 6; k = 10 lands as the
    // 10th of 10 items in bin 1: est = 8e6 + (8e6*(2*10-1)) div 20
    // = 15,600,000. Exact interpolated p50 of the bimodal set is 30.
    val hq = Registry.byName("ev_hist_quantile_merge").build(spark, dir)
      .collect().find(_.getString(0) == "error").get
    assert(hq.getLong(1) == 20 && hq.getLong(2) == 2, s"hist bins: $hq")
    assert(hq.getLong(3) == 15600000L, s"hist est interpolation: $hq")
    assert(hq.getDouble(4) == 30.0, s"exact p50: $hq")

    // distributed-median pin: the 65 pooled values sort to 1.0 x 23,
    // 2.0 x 10 (cum 33), ... — n odd, both middle order statistics are
    // rank 33 = 2.0
    val med = Registry.byName("ev_value_median_exact").build(spark, dir)
      .collect()(0)
    assert(med.getLong(0) == 65, s"median n: $med")
    assert(med.getLong(1) == 2000000L && med.getLong(2) == 2000000L,
      s"median order statistics: $med")
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
