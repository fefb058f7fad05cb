package graft

import org.scalatest.funsuite.AnyFunSuite

/** emb_ivfpq_delete's serving-ops contract, asserted at the FILE level
  * like EmbUpsertSpec (the plan can't show what a write touched):
  *   1. the compacted index is row-identical to the full served index
  *      MINUS the tombstoned slice — compaction loses nothing else and
  *      invents nothing;
  *   2. cell directories holding no tombstoned rows keep exactly their
  *      file set across the delete — the rewrite was partition-local
  *      (asserted on file NAMES, which a dynamic-overwrite rewrite
  *      would have replaced);
  *   3. no tombstoned id survives anywhere in the compacted index, and
  *      the query's own n_residual_deleted / n_deleted_surfaced rows
  *      report zero;
  *   4. the tombstone accounting matches an independent re-derivation
  *      from the pristine index.
  */
class EmbDeleteSpec extends AnyFunSuite {
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

  test("delete: partition-local compaction, tombstones gone, recall row") {
    import org.apache.spark.sql.functions._

    // stage the offline artifacts (served index + the delete scenario's
    // working copy) WITHOUT applying the delete, then snapshot the
    // per-cell file sets so the partition-local claim is checkable on
    // file names. If another suite already ran the delete in this JVM
    // the snapshot is post-compaction and the file-set assertion
    // degrades to "no further rewrite" — the content assertions below
    // stay strong either way.
    queries.EmbQueries.warmShared(spark, dir)
    val before = parquetFilesByCell("codes_del")
    assert(before.nonEmpty, "delete working copy missing")

    val row = Registry.byName("emb_ivfpq_delete").build(spark, dir)
      .collect()(0)
    val after = parquetFilesByCell("codes_del")

    val full = spark.read.parquet(s"$indexRoot/codes")
    val compacted = spark.read.parquet(s"$indexRoot/codes_del")
    val tomb = col("vec_id") % 10 === 7 && col("vec_id") =!= 0

    // 1. row-identical to full-minus-tombstoned
    val key = (d: org.apache.spark.sql.DataFrame) => d.select(
      col("vec_id"), col("cell"),
      array_join(transform(col("codes"), c => c.cast("string")), ",")
        .as("cs"))
    val expected = key(full.filter(!tomb))
    assert(expected.exceptAll(key(compacted)).isEmpty)
    assert(key(compacted).exceptAll(expected).isEmpty)

    // 2. untouched cells keep exactly their pre-delete file set
    val touched = full.filter(tomb)
      .select("cell").distinct().collect().map(_.get(0).toString).toSet
    assert(touched.nonEmpty, "tombstones landed nowhere — degenerate")
    before.foreach { case (cellDir, files) =>
      val cell = cellDir.stripPrefix("cell=")
      if (!touched.contains(cell)) {
        assert(after.get(cellDir).contains(files),
          s"untouched $cellDir was rewritten")
      }
    }

    // 3. no tombstoned id anywhere, and the query row says so
    assert(compacted.filter(tomb).count() == 0)
    assert(row.getAs[Long]("n_residual_deleted") == 0L)
    assert(row.getAs[Long]("n_deleted_surfaced") == 0L)

    // 4. accounting matches an independent re-derivation
    val nDeleted = full.filter(tomb).count()
    assert(nDeleted > 0)
    assert(row.getAs[Long]("n_deleted") == nDeleted)
    assert(row.getAs[Long]("n_cells_touched") == touched.size)
    assert(row.getAs[Long]("n_index_rows") == full.count() - nDeleted)
    // recall sanity: 0..5 hits, pct = 20*hits
    val hits = row.getAs[Long]("n_hits")
    assert(hits >= 0 && hits <= 5)
    assert(row.getAs[Long]("recall_pct") == hits * 20)
  }
}
