package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degrade-path pins the pinned testdata and edge corpus never reach:
  * micro corpora written to a temp dir and run through the REAL
  * Registry queries.
  *
  *   1. NULL event_type through ev_value_percentiles_approx — the
  *      round-8 ADVICE scenario: a plain equi-join back to the sketch
  *      frame silently drops the NULL group (null keys never
  *      equi-join) while the oracle's GROUP BY emits it. The fix is a
  *      null-safe (<=>) join; this spec is the regression pin.
  *   2. doc_bigram_surprisal with NO reference slice (no src0 docs):
  *      V = 0 and all counts NULL-coalesce to 0, so every surprisal
  *      must degrade to exactly 0 — the documented cross-engine
  *      convention, never an error.
  *   3. doc_bigram_surprisal where ONLY the reference has >= 2 tokens:
  *      zero scored rows, not a failure.
  */
class DegradePathSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("approx percentiles keep a NULL event_type group (null-safe join)") {
    import spark.implicits._
    val dir = tmp("nullty")
    Seq(
      (1L, "2024-01-01 00:00:00", 1L, Some("click"), 1.0, "{}"),
      (2L, "2024-01-01 00:00:01", 1L, Some("click"), 2.0, "{}"),
      (3L, "2024-01-01 00:00:02", 2L, None, 3.0, "{}"),
      (4L, "2024-01-01 00:00:03", 2L, None, 4.0, "{}"),
      (5L, "2024-01-01 00:00:04", 3L, Some("view"), 5.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = Registry.byName("ev_value_percentiles_approx")
      .build(spark, dir).collect()
    // THREE groups survive — click, view, and the NULL type the
    // pre-fix equi-join dropped — and every bound check passes
    assert(rows.length == 3, rows.mkString(";"))
    assert(rows.count(_.isNullAt(0)) == 1)
    assert(rows.forall(r => r.getBoolean(1) && r.getBoolean(2)))
  }

  private def writeDocs(dir: String, docs: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    docs.map { case (id, text, source) =>
      (id, text, "en", source, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("bigram surprisal degrades to zero scores with an empty reference") {
    val dir = tmp("noref")
    writeDocs(dir, Seq( // no src0 anywhere -> V = 0, all counts 0
      (1L, "alpha beta gamma", "src1"),
      (2L, "delta epsilon", "src2")))
    val rows = Registry.byName("doc_bigram_surprisal")
      .build(spark, dir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("sum_surprisal") == 0L, r.toString)
      assert(r.getAs[Double]("mean_surprisal") == 0.0, r.toString)
    }
  }

  test("bigram surprisal emits zero rows when no scored doc has a bigram") {
    val dir = tmp("nobigram")
    writeDocs(dir, Seq(
      (1L, "alpha beta gamma delta", "src0"), // reference only
      (2L, "single", "src1"),                 // 1 token -> no bigram
      (3L, "", "src2")))                      // empty -> no bigram
    assert(Registry.byName("doc_bigram_surprisal")
      .build(spark, dir).collect().isEmpty)
  }
}
