package graft

import org.scalatest.funsuite.AnyFunSuite

/** emb_ivfpq_rebalance's maintenance contract, asserted at the FILE
  * level like EmbDeleteSpec (the plan can't show what a write
  * touched):
  *   1. the rebalance moves rows between cells and does NOTHING else —
  *      the rebalanced index's (vec_id, codes, label) set is identical
  *      to the pristine served index's (PQ codes are cell-independent,
  *      so a split must not re-encode anything);
  *   2. only rows whose ORIGINAL cell was overgrown may change cell,
  *      and they land either back in that cell or in that cell's one
  *      new split id — nothing teleports;
  *   3. cell directories that were not overgrown keep exactly their
  *      file set across the rebalance — the rewrite was
  *      partition-local (asserted on file NAMES);
  *   4. no overgrown cell empties (seed A stays by construction) and
  *      every allocated split id is non-empty;
  *   5. the rebalanced centroid table keeps untouched centroids
  *      byte-identical and adds exactly one row per overgrown cell;
  *   6. the query's accounting row matches an independent
  *      re-derivation from the pristine index, and recall@5 is sane.
  */
class EmbRebalanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def indexRoot: java.io.File = {
    val h = java.lang.Integer.toHexString(dir.hashCode & 0x7fffffff)
    val pid = ProcessHandle.current().pid()
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_ivfpq_${pid}_$h").toFile
  }

  private def parquetFilesByCell(sub: String): Map[String, Set[String]] = {
    val root = new java.io.File(indexRoot, sub)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(d => d.getName ->
        d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet)
      .toMap
  }

  test("rebalance: partition-local split, codes untouched, accounting") {
    import org.apache.spark.sql.functions._

    // stage the offline artifacts (served index + the rebalance
    // working copy) WITHOUT applying the rebalance, then snapshot the
    // per-cell file sets. If another suite already ran the rebalance
    // in this JVM the snapshot is post-split and the file-set
    // assertion degrades to "no further rewrite" — the content
    // assertions below stay strong either way.
    queries.EmbQueries.warmShared(spark, dir)
    val before = parquetFilesByCell("codes_reb")
    assert(before.nonEmpty, "rebalance working copy missing")

    val row = Registry.byName("emb_ivfpq_rebalance").build(spark, dir)
      .collect()(0)
    val after = parquetFilesByCell("codes_reb")

    val full = spark.read.parquet(s"$indexRoot/codes")
    val reb = spark.read.parquet(s"$indexRoot/codes_reb")

    // independent re-derivation of the overgrown set off the pristine
    // index (the integer fair-share form the builder uses)
    val sz = full.groupBy("cell").agg(count(lit(1)).as("n")).collect()
    val nCells = sz.length.toLong
    val total = sz.map(_.getLong(1)).sum
    val overgrown = sz
      .filter(r => queries.EmbQueries.RebalanceDen * r.getLong(1) * nCells >
        queries.EmbQueries.RebalanceNum * total)
      .map(_.getInt(0)).sorted
    assert(overgrown.nonEmpty, "no overgrown cell at sf0.001 — degenerate")
    val maxLabel = sz.map(_.getInt(0)).max
    val newIdOf = overgrown.zipWithIndex
      .map { case (c, i) => c -> (maxLabel + i + 1) }.toMap

    // 1. identical (vec_id, codes, label) set — only `cell` may differ
    val key = (d: org.apache.spark.sql.DataFrame) => d.select(
      col("vec_id"), col("label"),
      array_join(transform(col("codes"), c => c.cast("string")), ",")
        .as("cs"))
    assert(key(full).exceptAll(key(reb)).isEmpty)
    assert(key(reb).exceptAll(key(full)).isEmpty)

    // 2. per-row cell movement is confined to overgrown -> {self, its
    //    split id}
    val moves = full.select(col("vec_id"), col("cell").as("c0"))
      .join(reb.select(col("vec_id"), col("cell").as("c1")), "vec_id")
      .filter(col("c0") =!= col("c1"))
      .collect()
    assert(moves.nonEmpty, "threshold split moved nothing — degenerate")
    moves.foreach { m =>
      val c0 = m.getInt(1); val c1 = m.getInt(2)
      assert(newIdOf.get(c0).contains(c1),
        s"row ${m.get(0)} teleported $c0 -> $c1")
    }

    // 3. non-overgrown cell dirs keep exactly their pre-split file set
    val ogDirs = overgrown.map(c => s"cell=$c").toSet
    before.foreach { case (cellDir, files) =>
      if (!ogDirs.contains(cellDir)) {
        assert(after.get(cellDir).contains(files),
          s"untouched $cellDir was rewritten")
      }
    }

    // 4. no source cell empties; every allocated split id is non-empty
    val rebSz = reb.groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    overgrown.foreach { c =>
      assert(rebSz.getOrElse(c, 0L) > 0, s"overgrown cell $c emptied")
      assert(rebSz.getOrElse(newIdOf(c), 0L) > 0,
        s"split id ${newIdOf(c)} of cell $c is empty")
    }

    // 5. centroid table: untouched rows identical, one new row per
    //    overgrown cell
    val cent = spark.read.parquet(s"$indexRoot/centroids")
    val cent2 = spark.read.parquet(s"$indexRoot/centroids_reb")
    assert(cent2.count() == cent.count() + overgrown.length)
    val ckey = (d: org.apache.spark.sql.DataFrame) => d.select(
      col("c_label"),
      array_join(transform(col("cvec"), c => c.cast("string")), ",")
        .as("cs"))
    val untouchedCent =
      ckey(cent.filter(!col("c_label").isin(overgrown.map(Int.box): _*)))
    assert(untouchedCent.exceptAll(ckey(cent2)).isEmpty,
      "an untouched centroid changed across the rebalance")

    // 6. accounting row vs the independent derivation
    assert(row.getAs[Long]("n_cells_before") == nCells)
    assert(row.getAs[Long]("n_overgrown") == overgrown.length.toLong)
    assert(row.getAs[Long]("n_cells_after") ==
      nCells + overgrown.length.toLong)
    assert(row.getAs[Long]("n_rows_moved") == moves.length.toLong)
    val hits = row.getAs[Long]("n_hits")
    assert(hits >= 0 && hits <= 5)
    assert(row.getAs[Long]("recall_pct") == hits * 20)
  }
}
