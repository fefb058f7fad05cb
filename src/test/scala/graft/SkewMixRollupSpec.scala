package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the skew-split join, HLL rollup, and temperature
  * mixing queries — the invariants their oracles prove cross-engine,
  * re-proven here in-engine so a refactor can't weaken them to
  * "matches whatever DuckDB happens to compute".
  */
class SkewMixRollupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("skew split join result equals the plain (unsplit) join exactly") {
    // the hot/cold routes partition the key space, so the union must
    // reproduce the plain join row-for-row — same aggregate, no split
    val split = Registry.byName("ev_skew_split_join").build(spark, dir)
    val fact = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_type"),
        col("ts").cast("long").as("es"))
    val dim = fact.groupBy("user_id")
      .agg(min(col("es")).as("first_s"), count(lit(1)).as("n_u"))
    val plain = fact.join(dim, Seq("user_id"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count(when(col("n_u") > 75L, 1)).as("n_hot"),
        sum((col("es") - col("first_s")).cast("decimal(19,0)"))
          .cast("decimal(38,0)").cast("long").as("sum_age_s"))
      .orderBy("event_type")
    assert(split.collect().toSeq == plain.collect().toSeq)
    // and the hot route is genuinely exercised at this SF (a threshold
    // drift that routes everything cold would pass the equality above)
    assert(split.agg(sum("n_hot")).head().getLong(0) > 0)
  }

  test("temperature mix flattens the distribution and stays normalized") {
    val rows = Registry.byName("doc_temperature_mix").build(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("share_ppm"), r.getAs[Long]("w_alpha_ppm"),
        r.getAs[Long]("boost_ppm")))
    val L = rows.length
    // each ppm column sums to 1e6 up to one floor per group
    for (tot <- Seq(rows.map(_._3).sum, rows.map(_._4).sum)) {
      assert(tot <= 1000000L && tot > 1000000L - L, tot)
    }
    // α=1/2 flattening: the majority language is downsampled
    // (boost < 1), every minority language upsampled (boost > 1)
    val maxN = rows.map(_._2).max
    rows.foreach { case (lang, n, share, w, boost) =>
      if (n == maxN) {
        assert(w < share && boost < 1000000L, lang)
      } else {
        assert(w > share && boost > 1000000L, lang)
      }
    }
  }

  test("HLL rollup: every grain's estimate lands within its 5% gate") {
    val rows = Registry.byName("ev_hll_rollup").build(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("within_5pct")))
    val total = rows.filter(_.getAs[String]("grain") == "total")
    assert(total.length == 1)
    val exactUsers = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select("user_id").distinct().count()
    assert(total.head.getAs[Long]("n_exact") == exactUsers)
    // day rows cover the table's full day domain
    assert(rows.count(_.getAs[String]("grain") == "day") >= 28)
  }
}
