package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

/** Correctness of the label-propagation + pointer-jumping components
  * operator against a local union-find, including the worst case for
  * plain propagation (a long path graph, where convergence must come
  * from the jumping step, not from diameter-many rounds).
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runCc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("path graph of 200 nodes collapses to one component") {
    // diameter 199 >> maxIter=30: only pointer jumping can converge here
    val edges = (0L until 199L).map(i => (i, i + 1))
    val got = runCc(edges)
    assert(got.size == 200)
    assert(got.values.toSet == Set(0L))
  }

  test("disjoint components keep distinct min labels") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 30L))
    val got = runCc(edges)
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("seeded random graph matches a local union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    assert(runCc(edges) == unionFind(edges))
  }

  test("nothing stays pinned after CacheRegistry.clear") {
    import spark.implicits._
    ConnectedComponents.run(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
      .collect()
    CacheRegistry.clear(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
