package graft

import org.scalatest.funsuite.AnyFunSuite

/** dedup_substring_spans' structural contract, and its tie to the
  * fixed-granularity window query it generalizes:
  *   1. WINDOW-RATIO TIE: the set of documents owning at least one
  *      span is EXACTLY the set dedup_substring_windows reports with
  *      n_shared > 0 — both derive "shared" from the same 12-token
  *      hash appearing in >= 2 distinct docs, so neither may see a
  *      doc the other misses;
  *   2. TOKEN DISJOINTNESS + MAXIMALITY: within a doc, spans are
  *      disjoint in TOKEN space with a gap (next.span_start >
  *      prev.span_end + 1) — `>=` would allow adjacent-but-mergeable
  *      spans, and plain non-overlap would still permit the start-gap
  *      < W overlap bug (starts 1 and 3 emitting [1,12] and [3,14]);
  *   3. GEOMETRY: span_len = span_end - span_start + 1 >= W and
  *      span_start >= 1 — every span is a real window-cover;
  *   4. INDEPENDENT COVERAGE: the spans' covered token set per doc
  *      equals the union of [i, i+W-1] over shared window starts,
  *      where the shared starts are RECOMPUTED here from the raw
  *      documents table (own explode + own >= 2-distinct-docs rule,
  *      plain Scala interval union) — so sum(span_len) is pinned to
  *      the exact duplicated-token coverage by construction, not by
  *      re-running the query's own merge.
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

      // (2) + (3) per-doc geometry, token disjointness, maximality
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
            // strict token gap: spans that overlap OR abut should have
            // been merged into one maximal duplicated region
            assert(b.getAs[Int]("span_start") > a.getAs[Int]("span_end") + 1,
              s"doc $doc spans overlap/abut in token space: " +
                s"(..,${a.getAs[Int]("span_end")}) then " +
                s"(${b.getAs[Int]("span_start")},..)")
          case _ => ()
        }
      }
    }
  }

  test("span coverage equals independently recomputed duplicated-token union") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.sf0001

    // Independent recomputation of duplicated token coverage: own
    // tokenize + explode + shared rule, NO reuse of substringSpans'
    // lineage or merge logic. Interval union happens in local Scala.
    val tok = Tables.t(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.NormTokens.column(col("text")).as("tok"))
      .filter(size(col("tok")) >= W)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(1), size(col("tok")) - (W - 1)),
          i => struct(i.as("i"),
            md5(array_join(slice(col("tok"), i, lit(W)), " "))
              .as("wh")))).as("p"))
      .select(col("doc_id"), col("p.i").as("i"), col("p.wh").as("wh"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("i"),
        r.getAs[String]("wh")))

    val sharedHashes = tok.groupBy(_._3)
      .filter { case (_, rows) => rows.map(_._1).distinct.size >= 2 }
      .keySet
    val expectedCover: Map[Long, Set[Int]] = tok
      .filter(t => sharedHashes.contains(t._3))
      .groupBy(_._1)
      .map { case (doc, rows) =>
        doc -> rows.flatMap(t => t._2 to (t._2 + W - 1)).toSet
      }

    val spans = Registry.byName("dedup_substring_spans")
      .build(spark, dir).collect()
    val gotCover: Map[Long, Set[Int]] = spans
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (doc, rs) =>
        doc -> rs.flatMap(r =>
          r.getAs[Int]("span_start") to r.getAs[Int]("span_end")).toSet
      }

    assert(gotCover.keySet == expectedCover.keySet,
      s"covered-doc sets differ: only-spans=${
        (gotCover.keySet -- expectedCover.keySet).take(5)}, only-indep=${
        (expectedCover.keySet -- gotCover.keySet).take(5)}")
    gotCover.foreach { case (doc, got) =>
      val exp = expectedCover(doc)
      assert(got == exp,
        s"doc $doc coverage mismatch: spans-only=${(got -- exp).take(8)}" +
          s", indep-only=${(exp -- got).take(8)}")
    }
    // and therefore sum(span_len) IS the exact duplicated-token count
    spans.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, rs) =>
      assert(rs.map(_.getAs[Int]("span_len")).sum ==
        expectedCover(doc).size,
        s"doc $doc sum(span_len) != coverage size")
    }
  }

  test("the act step cuts exactly what the spans price") {
    // price <-> act consistency: per doc, dedup_spans_applied.n_cut
    // must equal dedup_substring_spans' sum(span_len) — true ONLY
    // because the interval merge makes spans token-disjoint (the old
    // start-run merge would have priced overlapping spans twice while
    // the cut removes each token once)
    val dir = TestSpark.sf0001
    val priced = Registry.byName("dedup_substring_spans")
      .build(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Int]("span_len")).sum).toMap
    val applied = Registry.byName("dedup_spans_applied")
      .build(spark, dir).collect()
    assert(applied.map(_.getAs[Long]("doc_id")).toSet == priced.keySet)
    applied.foreach { r =>
      val doc = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("n_cut") == priced(doc),
        s"doc $doc: cut ${r.getAs[Int]("n_cut")} priced ${priced(doc)}")
      assert(r.getAs[Int]("n_kept") + r.getAs[Int]("n_cut") ==
        r.getAs[Int]("n_tokens"))
    }
  }
}
