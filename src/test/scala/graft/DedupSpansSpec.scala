package graft

import org.scalatest.funsuite.AnyFunSuite

/** dedup_substring_spans' structural contract, and its tie to the
  * fixed-granularity window query it generalizes:
  *   1. WINDOW-RATIO TIE: the set of documents owning at least one
  *      span is EXACTLY the set dedup_substring_windows reports with
  *      n_shared > 0 — both derive "shared" from the same 12-token
  *      hash appearing in >= 2 distinct docs, so neither may see a
  *      doc the other misses;
  *   2. MAXIMALITY: within a doc, consecutive spans are separated by
  *      at least one UNSHARED window start (next.span_start >=
  *      prev_end_position + 2 where prev_end_position =
  *      prev.span_end - W + 1) — adjacent or overlapping spans would
  *      mean the run-merge failed;
  *   3. GEOMETRY: span_len = span_end - span_start + 1 >= W and
  *      span_start >= 1 — every span is a real window-cover.
  */
class DedupSpansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val W = 12

  test("spans tie to the window-ratio query and are maximal") {
    import org.apache.spark.sql.functions._
    locally {
      val dir = TestSpark.sf0001
      val spans = Registry.byName("dedup_substring_spans")
        .build(spark, dir).collect()
      val windows = Registry.byName("dedup_substring_windows")
        .build(spark, dir).collect()

      // (1) the window query only EMITS docs with n_shared > 0, so its
      // doc set must equal the span-owning doc set
      val spanDocs = spans.map(_.getAs[Long]("doc_id")).toSet
      val sharedDocs = windows.map(_.getAs[Long]("doc_id")).toSet
      assert(spanDocs == sharedDocs,
        s"span/window doc sets differ: only-spans=${
          (spanDocs -- sharedDocs).take(5)}, only-windows=${
          (sharedDocs -- spanDocs).take(5)}")

      // (2) + (3) per-doc geometry and maximality
      spans.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, rs) =>
        val sorted = rs.sortBy(_.getAs[Int]("span_start"))
        sorted.foreach { r =>
          val st = r.getAs[Int]("span_start")
          val en = r.getAs[Int]("span_end")
          val ln = r.getAs[Int]("span_len")
          assert(st >= 1 && ln == en - st + 1 && ln >= W,
            s"doc $doc bad span ($st,$en,$ln)")
        }
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            val prevEndPos = a.getAs[Int]("span_end") - W + 1
            assert(b.getAs[Int]("span_start") >= prevEndPos + 2,
              s"doc $doc spans not maximal: ${a.getAs[Int]("span_end")}" +
                s" then ${b.getAs[Int]("span_start")}")
          case _ => ()
        }
      }
    }
  }
}
