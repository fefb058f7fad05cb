package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** emb_range_search's lossless-pruning contract on a corpus DESIGNED so
  * the triangle-inequality bound must actually fire: three tight
  * clusters (labels 0/1/2) separated by ~80 in L2 while the radius is
  * sqrt(1.6) ~ 1.26 — the two far clusters' lower bounds exceed the
  * radius by orders of magnitude, so a correct pruner never scans them
  * and a WRONG pruner (one that could drop a boundary cell) would lose
  * the near cluster's hits. The assert is equality with a spec-side
  * brute force; a second assert recomputes the bound from raw data to
  * document that the geometry makes pruning mandatory, not vacuous.
  */
class RangeSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("range search equals brute force where pruning must fire") {
    import spark.implicits._
    val dim = 64
    // deterministic jitter in [-0.1, 0.1]
    def jit(id: Int, i: Int): Float =
      (((id * 31 + i * 17) % 21) - 10) / 100.0f
    def member(id: Int, center: Float): (Long, Seq[Float], Int) =
      (id.toLong, (0 until dim).map(i => center + jit(id, i)), id / 10)
    // cluster 0 at 0.0 (vec 0 = the query), cluster 1 at +10, 2 at -10
    val rows = (0 until 10).map(member(_, 0.0f)) ++
      (10 until 20).map(member(_, 10.0f)) ++
      (20 until 30).map(member(_, -10.0f))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_range").toString
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"),
        col("label").cast("int"))
      .write.parquet(s"$dir/embeddings.parquet")

    val got = Registry.byName("emb_range_search").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // spec-side brute force with the same rounding
    val q = rows.head._2.map(_.toDouble)
    val brute = rows.tail.map { case (id, v, _) =>
      val d2 = v.map(_.toDouble).zip(q).map { case (a, b) =>
        (a - b) * (a - b)
      }.sum
      (id, BigDecimal(d2).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    }.filter(_._2 <= queries.EmbQueries.RangeR2)
      .sortBy(r => (r._2, r._1))
    assert(brute.nonEmpty, "designed radius caught nothing — degenerate")
    assert(brute.map(_._1).toSet subsetOf (1L to 9L).toSet,
      "a far-cluster member fell inside the radius — geometry broken")
    assert(got == brute, s"got=$got brute=$brute")

    // the geometry makes pruning MANDATORY: both far clusters' lower
    // bounds (|q - center| minus the max in-cluster spread) dwarf the
    // radius, so a pruner using the triangle inequality must skip them
    val spread = math.sqrt(dim * 0.2 * 0.2) // max |jitter| per dim = 0.1
    val farDist = math.sqrt(dim * 10.0 * 10.0) - spread * 2
    assert(farDist - spread > math.sqrt(queries.EmbQueries.RangeR2) * 10,
      "far clusters would not be prunable — test geometry broken")
  }
}
