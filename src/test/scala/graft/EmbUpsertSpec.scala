package graft

import org.scalatest.funsuite.AnyFunSuite

/** emb_ivfpq_upsert's serving-ops contract, asserted at the FILE level
  * (the plan can't show what a write touched):
  *   1. the updated index is row-identical to the full served index —
  *     upsert(base, batch) loses nothing and invents nothing;
  *   2. cell directories the batch does not land in keep exactly their
  *     base file set — the append was partition-local;
  *   3. every batch row is present in the updated index;
  *   4. the query's recall row agrees with emb_ivfpq_recall (same
  *     index content, same arithmetic).
  */
class EmbUpsertSpec extends AnyFunSuite {
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

  test("upsert: identical content, partition-local append, recall agrees") {
    // force the full query once (builds base + applies the upsert)
    val row = Registry.byName("emb_ivfpq_upsert").build(spark, dir)
      .collect()(0)

    // 2. untouched cells keep exactly the base files. The base file
    // sets are recoverable AFTER the append because append never
    // rewrites existing files: base files are the ones whose cell dir
    // existed pre-append — approximate by re-deriving touched cells
    // from the batch predicate on the full index.
    val full = spark.read.parquet(s"$indexRoot/codes")
    val updated = spark.read.parquet(s"$indexRoot/codes_upsert")

    // 1 + 3. row-identical to the full served index
    import org.apache.spark.sql.functions._
    val key = (d: org.apache.spark.sql.DataFrame) => d.select(
      col("vec_id"), col("cell"),
      array_join(transform(col("codes"), c => c.cast("string")), ",")
        .as("cs"))
    assert(key(full).exceptAll(key(updated)).isEmpty)
    assert(key(updated).exceptAll(key(full)).isEmpty)

    val touched = full
      .filter(col("vec_id") % 10 === 3 && col("vec_id") =!= 0)
      .select("cell").distinct().collect().map(_.get(0).toString).toSet
    val baseFiles = parquetFilesByCell("codes_upsert")
    baseFiles.foreach { case (cellDir, files) =>
      val cell = cellDir.stripPrefix("cell=")
      if (!touched.contains(cell)) {
        // untouched: every file predates the append — assert by
        // re-reading only this dir and finding zero batch rows
        val rows = spark.read.parquet(s"$indexRoot/codes_upsert/$cellDir")
          .filter(col("vec_id") % 10 === 3 && col("vec_id") =!= 0)
          .count()
        assert(rows == 0, s"batch rows leaked into untouched $cellDir")
      }
    }
    assert(touched.nonEmpty, "batch landed nowhere — scenario degenerate")

    // 4. recall agrees with emb_ivfpq_recall on the same corpus
    val recall = Registry.byName("emb_ivfpq_recall").build(spark, dir)
      .collect()(0)
    assert(row.getAs[Long]("n_hits") == recall.getAs[Long]("n_hits"))
    assert(row.getAs[Long]("recall_pct") ==
      recall.getAs[Long]("recall_pct"))
    // batch accounting sanity: ~10% of the corpus, nonzero
    val nBase = row.getAs[Long]("n_base")
    val nBatch = row.getAs[Long]("n_batch")
    assert(nBatch > 0 && nBatch < nBase)
    assert(row.getAs[Long]("n_cells_touched") == touched.size)
  }
}
