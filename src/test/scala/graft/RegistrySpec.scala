package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registry query must build and execute at sf0.001 (the driver's
  * smoke scale). Known-cardinality queries are pinned.
  */
class RegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("no duplicate names; oracle coverage is near-total") {
    assert(Registry.byName.size == Registry.all.size)
    val noOracle = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    // only engine-specific-value ops may skip the oracle
    assert(noOracle.toSet.subsetOf(
      Set("ev_approx_distinct_users", "doc_sentiment_ml_counts")))
  }

  test("every query executes at sf0.001") {
    Registry.all.foreach { q =>
      val df = q.build(spark, dir)
      val n = df.count()
      assert(n >= 0, q.name)
      assert(df.columns.nonEmpty, q.name)
    }
  }

  test("pinned cardinalities") {
    def n(name: String): Long = Registry.byName(name).build(spark, dir).count()
    assert(n("doc_project") == 500)
    assert(n("doc_topk_longest") == 20)
    assert(n("emb_knn_cosine") == 10)
    assert(n("star_q1_pricing") == 6)
    assert(n("emb_centroid_by_label") == 640) // 10 labels x 64 dims
    assert(n("ev_distinct_users") == 1)
    assert(n("emb_ivf_ann") == 5)
    assert(n("emb_multi_knn") == 15) // 5 query vectors x top-3
    assert(n("dedup_minhash_pairs") == 28) // sf0.001's near-dup pairs
    assert(n("dedup_minhash_survivors") == 1)
    assert(n("star_pivot") == 3) // returnflag values A/N/R
    assert(n("doc_hash_split_counts") == 3) // train/val/test
    assert(n("ev_value_range_join") == 20) // one row per value band
    assert(n("dedup_split_contamination") == 1)
    assert(n("doc_tfidf_top_terms") == 1500) // 500 docs x top-3
  }

  test("flagship entry returns data") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("driver contract maps stay consistent") {
    assert(SparkEntry.queries.keySet == Registry.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
