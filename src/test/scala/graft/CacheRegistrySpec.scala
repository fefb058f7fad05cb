package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared-lineage caches must be fully releasable: after
  * CacheRegistry.clear, no persisted RDD blocks remain (the harness
  * calls clear before session stop, so a Verify+Bench cycle pins
  * nothing), and a cleared memo rebuilds instead of serving stale
  * frames.
  */
class CacheRegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("consumers pin storage; clear releases every block and drops memos") {
    // drive both memoized lineages (minhash pairs + emb pairs) the way
    // Verify/Bench do
    Registry.byName("dedup_minhash_pairs")
      .build(spark, TestSpark.sf0001).count()
    Registry.byName("emb_near_dup_pairs")
      .build(spark, TestSpark.sf0001).count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "expected the shared lineages to persist their bounded frames")
    CacheRegistry.clear(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      spark.sparkContext.getPersistentRDDs.values.map(_.name).toList.toString)
    // a fresh consumer after clear still works (memo rebuilt, not stale)
    val again = Registry.byName("dedup_minhash_pairs")
      .build(spark, TestSpark.sf0001)
    assert(again.columns.toSeq == Seq("a_id", "b_id", "jaccard"))
    again.count()
    CacheRegistry.clear(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
