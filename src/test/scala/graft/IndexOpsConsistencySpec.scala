package graft

import org.scalatest.funsuite.AnyFunSuite

/** The index-ops trio (emb_index_integrity, emb_retrain_decision,
  * emb_cell_balance) all claim to read the SAME post-rebalance state —
  * these pins make the claim load-bearing: the retrain decision's
  * drift signal must equal the fsck's misplaced_rows, its row/cell
  * totals must match the fsck's universe, and the decision booleans
  * must be exactly the integer predicates over those signals.
  */
class IndexOpsConsistencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("retrain decision signals equal the fsck's measurements") {
    val fsck = Registry.byName("emb_index_integrity").build(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dec = Registry.byName("emb_retrain_decision").build(spark, dir)
      .collect()(0)
    val nRows = dec.getAs[Long]("n_rows")
    val nCells = dec.getAs[Long]("n_cells")
    val maxCell = dec.getAs[Long]("max_cell_n")
    val nMis = dec.getAs[Long]("n_misplaced")
    assert(nMis == fsck("misplaced_rows"),
      s"decision drift $nMis != fsck ${fsck("misplaced_rows")}")
    // referential checks green => the decision's universe is the
    // full index
    assert(fsck("dangling_codes") == 0L)
    assert(fsck("unindexed_vectors") == 0L)
    // the booleans are exactly the integer predicates
    val skew = graft.queries.EmbQueries.RebalanceDen * maxCell * nCells >
      graft.queries.EmbQueries.RebalanceNum * nRows
    val drift = nRows > 0 && nMis * 10 >= nRows
    assert(dec.getAs[Boolean]("skew_over_threshold") == skew)
    assert(dec.getAs[Boolean]("drift_over_threshold") == drift)
    assert(dec.getAs[Boolean]("retrain_due") == (skew || drift))
    // and the row universe matches the artifact the fsck audited
    assert(maxCell <= nRows && nCells > 0 && nRows > 0)
  }

  test("retrain accounting reads the same drift the fsck measured") {
    // the epoch's misplaced_before and the fsck's misplaced_rows share
    // one lineage (rebalancedNear) — the accounting can never claim to
    // have cured a different drift than the audit reported; and the
    // decision the epoch answers must have been `due`
    val fsck = Registry.byName("emb_index_integrity").build(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dec = Registry.byName("emb_retrain_decision").build(spark, dir)
      .collect()(0)
    val rt = Registry.byName("emb_ivfpq_retrain").build(spark, dir)
      .collect()(0)
    assert(rt.getAs[Long]("misplaced_before") == fsck("misplaced_rows"))
    assert(rt.getAs[Long]("misplaced_after") == 0L)
    assert(dec.getAs[Boolean]("retrain_due"),
      "the executed epoch should answer a due decision on this state")
    // cell accounting is internally closed
    assert(rt.getAs[Long]("n_cells_after") + rt.getAs[Long]("n_cells_pruned") >=
      rt.getAs[Long]("n_cells_before"))
  }

  test("label-aware serving serves exactly the repair's chosen depths") {
    val repair = Registry.byName("emb_label_nprobe_repair")
      .build(spark, dir).collect()
      .map(r => r.getAs[Int]("a_label") -> r.getAs[Int]("nprobe_chosen"))
      .toMap
    val served = Registry.byName("emb_label_aware_serving")
      .build(spark, dir).collect()
    assert(served.nonEmpty)
    served.foreach { r =>
      val lbl = r.getAs[Int]("a_label")
      assert(r.getAs[Int]("nprobe") == repair(lbl),
        s"label $lbl served at ${r.getAs[Int]("nprobe")} but repair chose ${repair(lbl)}")
    }
    // per-anchor answer completeness: 5 ranked rows each, rank 1..5
    served.groupBy(_.getAs[Long]("a_id")).foreach { case (a, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5),
        s"anchor $a has ranks ${rs.map(_.getAs[Int]("rank")).sorted.toSeq}")
    }
  }
}
