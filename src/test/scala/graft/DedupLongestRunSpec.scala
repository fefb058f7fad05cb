package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** dedup_pair_longest_run's contract, cross-checked INDEPENDENTLY:
  *   1. for every emitted pair, (run_len, a_start, b_start) equals a
  *      local O(n*m) dynamic-programming longest-common-substring over
  *      the two token arrays (own tokenization call, no reuse of the
  *      query's diagonal-island machinery), with the query's exact
  *      tie order (max len, min a_start, min b_start);
  *   2. the run really is a common substring (token-for-token equal)
  *      and is maximal (extending one token either side mismatches or
  *      falls off an end);
  *   3. candidate pairs ABSENT from the output share no token at all.
  */
class DedupLongestRunSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("longest common run matches an independent local DP per pair") {
    val dir = TestSpark.sf0001
    val out = Registry.byName("dedup_pair_longest_run")
      .build(spark, dir).collect()
    assert(out.nonEmpty, "no candidate pair produced a run")

    val toks: Map[Long, IndexedSeq[String]] =
      Tables.t(spark, dir, "documents")
        .select(col("doc_id"),
          graft.functions.NormTokens.column(col("text")).as("tok"))
        .collect()
        .map(r => r.getLong(0) ->
          Option(r.getSeq[String](1)).getOrElse(Seq.empty).toIndexedSeq)
        .toMap

    // classic DP over the match matrix; ties exactly as the query
    // orders them (max len, then min a_start, then min b_start)
    def lcsRun(a: IndexedSeq[String], b: IndexedSeq[String])
        : (Int, Int, Int) = {
      var best = (0, 0, 0)
      val m = Array.ofDim[Int](b.length + 1)
      var i = 1
      while (i <= a.length) {
        var prevDiag = 0
        var j = 1
        while (j <= b.length) {
          val tmp = m(j)
          m(j) = if (a(i - 1) == b(j - 1)) prevDiag + 1 else 0
          prevDiag = tmp
          if (m(j) > 0) {
            val len = m(j); val as = i - len + 1; val bs = j - len + 1
            if (len > best._1 || (len == best._1 &&
                (as < best._2 || (as == best._2 && bs < best._3))))
              best = (len, as, bs)
          }
          j += 1
        }
        i += 1
      }
      best
    }

    val emitted = out.map(r =>
      (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    out.foreach { r =>
      val a = toks(r.getAs[Long]("a_id"))
      val b = toks(r.getAs[Long]("b_id"))
      val got = (r.getAs[Int]("run_len"), r.getAs[Int]("a_start"),
        r.getAs[Int]("b_start"))
      val exp = lcsRun(a, b)
      assert(got == exp,
        s"pair (${r.getAs[Long]("a_id")},${r.getAs[Long]("b_id")}): " +
          s"query $got vs DP $exp")
      // (2) substring equality + maximality
      val (len, as0, bs0) = got
      val runA = a.slice(as0 - 1, as0 - 1 + len)
      val runB = b.slice(bs0 - 1, bs0 - 1 + len)
      assert(runA == runB, s"emitted run is not a common substring")
      val leftExtends = as0 > 1 && bs0 > 1 && a(as0 - 2) == b(bs0 - 2)
      val rightExtends = as0 - 1 + len < a.length &&
        bs0 - 1 + len < b.length && a(as0 - 1 + len) == b(bs0 - 1 + len)
      assert(!leftExtends && !rightExtends, "emitted run is not maximal")
    }

    // (3) a candidate pair missing from the output shares no token
    Registry.byName("dedup_minhash_pairs").build(spark, dir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filterNot(emitted)
      .foreach { case (aId, bId) =>
        val common = toks.getOrElse(aId, IndexedSeq.empty).toSet
          .intersect(toks.getOrElse(bId, IndexedSeq.empty).toSet)
        assert(common.isEmpty,
          s"pair ($aId,$bId) shares tokens ${common.take(3)} but " +
            "emitted no run")
      }
  }
}
