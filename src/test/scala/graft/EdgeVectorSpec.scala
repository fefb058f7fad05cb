package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Off-contract embeddings (ragged length, NULL element) must degrade
  * cleanly, not crash or capture results: these inputs once collapsed
  * every PQ code onto a NULL-distance codebook entry (Spark windows
  * default to NULLS FIRST where DuckDB defaults to NULLS LAST) and threw
  * inside the typed top-k aggregator. The DuckDB parity of the same
  * fixtures is covered by tools/make_edge_data.py + the local gate; this
  * spec pins the Spark-side behavior in `sbt test`.
  */
class EdgeVectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_edgevec").toString
    def vec(seed: Int): Seq[java.lang.Float] =
      (0 until 64).map(j => java.lang.Float.valueOf(
        (((seed * 31 + j * 7) % 97) - 48) / 97.0f))
    val rows = (0 until 20).map { i =>
      val v: Seq[java.lang.Float] =
        if (i == 11) vec(11).take(32) // ragged, and a PQ/k-means SEED
        else if (i == 13) vec(13).updated(20, null.asInstanceOf[java.lang.Float])
        else vec(i)
      Row(i.toLong, v, i % 10)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true)),
      StructField("label", IntegerType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("PQ codes do not collapse onto a NULL-distance codebook entry") {
    val out = Registry.byName("emb_pq_ann").build(spark, dir).collect()
    assert(out.length == 5)
    // the collapse symptom was every vector getting the SAME distance
    val d2s = out.map(_.getDouble(1)).toSet
    assert(d2s.size > 1, s"all pq_d2 identical: ${out.mkString(", ")}")
    assert(out.forall(!_.isNullAt(1)))
  }

  test("k-means assigns off-contract vectors without capturing argmin") {
    val out = Registry.byName("emb_kmeans").build(spark, dir).collect()
    assert(out.length == 20)
    // full-length vectors must get real distances (NULL d2 only for the
    // two off-contract rows)
    assert(out.count(_.isNullAt(2)) == 2, out.mkString(", "))
  }

  test("multi-query KNN drops NULL sims instead of crashing the agg") {
    val out = Registry.byName("emb_multi_knn").build(spark, dir).collect()
    assert(out.length == 15) // 5 queries x top-3 (13 valid candidates)
    assert(out.forall(!_.isNullAt(3)))
  }
}
