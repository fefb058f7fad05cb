package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two round-10 tuning/diagnostic ops against independent
  * re-derivations:
  *
  *  - `emb_anisotropy` claims the O(n·d) sum-vector identity computes
  *    EXACTLY the mean pairwise cosine of the snap6-gridded unit
  *    vectors. The spec recomputes that metric the naive O(n²·d) way
  *    (explicit pair loop over the same grid) and asserts equality —
  *    if the identity's algebra or decimal staging ever drifts, this
  *    catches it without DuckDB in the loop.
  *  - `emb_nprobe_autotune` claims recall@5 is monotone in probe depth
  *    and `chosen` marks the SMALLEST depth clearing the 40% target.
  *    Monotonicity is a theorem of the construction (candidates(p) ⊆
  *    candidates(p+1), and a global-top-5 member can never be pushed
  *    out of a candidate top-5 by a non-member, which would have to
  *    outrank it on the shared (sim, vec_id) key); the spec pins it so
  *    a future re-keying that silently breaks the argument fails here.
  */
class AnisotropyAutotuneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 10 vectors: 5 clean in label 0, 3 clean in label 1, one zero vector
  // (label 0) and one null-element vector (label 1) — the excluded pair.
  private def vec(seed: Int): Seq[java.lang.Float] =
    (0 until 64).map(j => java.lang.Float.valueOf(
      (((seed * 31 + j * 7) % 97) - 48) / 97.0f))

  private lazy val clean: Map[Int, (Seq[java.lang.Float], Int)] =
    ((0 until 5).map(i => i -> (vec(i), 0)) ++
      (5 until 8).map(i => i -> (vec(i), 1))).toMap

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_aniso").toString
    val rows = (0 until 10).map { i =>
      val (v, lbl): (Seq[java.lang.Float], Int) =
        if (i == 8) (Seq.fill(64)(java.lang.Float.valueOf(0f)), 0)
        else if (i == 9)
          (vec(9).updated(20, null.asInstanceOf[java.lang.Float]), 1)
        else clean(i)
      Row(i.toLong, v, lbl)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true)),
      StructField("label", IntegerType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  /** snap6 grid of the unit vector, replicating the kernels exactly:
    * in-order double fold for the norm, HALF_UP (away-from-zero) round
    * of comp·1e6 — Spark's round(), not Math.round.
    */
  private def grid(v: Seq[java.lang.Float]): Seq[Long] = {
    val n = math.sqrt(
      v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    v.map { x =>
      java.math.BigDecimal.valueOf(x.toDouble / n * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    }
  }

  private def naiveAvgPairCos(ids: Seq[Int]): Double = {
    val gs = ids.map(i => grid(clean(i)._1))
    val pairSum = (for {
      a <- gs; b <- gs if a ne b
    } yield (a, b)).map { case (a, b) =>
      a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
    }.sum
    val n = gs.size.toLong
    val raw = pairSum.toDouble / (n * (n - 1).toDouble * 1e12)
    java.math.BigDecimal.valueOf(raw)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  test("anisotropy identity == naive O(n^2) pair mean, per label + all") {
    val out = Registry.byName("emb_anisotropy").build(spark, dir).collect()
    val byLabel = out.map(r =>
      r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // zero vector (id 8) and null-element vector (id 9) excluded
    assert(byLabel(0)._1 == 5L)
    assert(byLabel(1)._1 == 3L)
    assert(byLabel(-1)._1 == 8L)
    assert(byLabel(0)._2 == naiveAvgPairCos(0 until 5))
    assert(byLabel(1)._2 == naiveAvgPairCos(5 until 8))
    assert(byLabel(-1)._2 == naiveAvgPairCos(0 until 8))
  }

  test("autotune: recall monotone in depth, chosen = min clearing 40%") {
    val out = Registry.byName("emb_nprobe_autotune").build(spark, dir)
      .collect().sortBy(_.getInt(0))
    assert(out.length == 3)
    val hits = out.map(_.getLong(1))
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
      s"recall not monotone: ${hits.mkString(",")}")
    val nTotal = out.head.getLong(2)
    assert(out.forall(_.getLong(2) == nTotal))
    val qualifying = out.filter(r => r.getLong(1) * 100 >= nTotal * 40)
    val chosenRows = out.filter(_.getBoolean(4))
    if (qualifying.isEmpty) assert(chosenRows.isEmpty)
    else {
      assert(chosenRows.length == 1)
      assert(chosenRows.head.getInt(0) == qualifying.head.getInt(0))
    }
  }

  test("adaptive filtered search routes by selectivity, both directions") {
    // real sf0.001: label 3 is ~10% of the corpus (above the 5%
    // crossover -> pruned ANN scan), the conjunctive rare predicate
    // ~1.4% (below -> exact pre-filter). Both arms must surface.
    val out = Registry.byName("emb_filtered_adaptive")
      .build(spark, "/root/testdata/sf0.001").collect()
    val byScenario = out.groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getString(1)).distinct.toSeq }
    assert(byScenario("broad") == Seq("pruned_scan"))
    assert(byScenario("rare") == Seq("exact_prefilter"))
    // the exact arm IS exact: re-derive its top-5 brute-force
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter("vec_id = 0").collect()(0)
      .getSeq[Float](1).map(_.toDouble).toArray
    def cos(v: Array[Double]): Double = {
      var dq = 0.0; var nq = 0.0; var nv = 0.0; var i = 0
      while (i < v.length) {
        dq += v(i) * q(i); nq += q(i) * q(i); nv += v(i) * v(i); i += 1
      }
      if (nq * nv == 0) 0.0 else dq / (math.sqrt(nq) * math.sqrt(nv))
    }
    val expected = e
      .filter("vec_id <> 0 AND label = 3 AND vec_id % 7 = 0").collect()
      .map(r => (r.getLong(0), cos(r.getSeq[Float](1).map(_.toDouble).toArray)))
      .map { case (id, s) =>
        (id, java.math.BigDecimal.valueOf(s)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
      }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
    val got = out.filter(_.getString(0) == "rare").map(_.getLong(2)).toSeq
    assert(got == expected, s"exact arm rows $got != brute force $expected")
  }
}
