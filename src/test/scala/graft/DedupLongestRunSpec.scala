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

  // classic DP over the match matrix; ties exactly as the query
  // orders them (max len, then min a_start, then min b_start)
  private def lcsRun(a: IndexedSeq[String], b: IndexedSeq[String])
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

  test("suffix-automaton kernel is DP-exact on adversarial repeated-token pairs and stays linear-shaped") {
    // THE adversarial class the match-matrix join form blows up on:
    // one token repeated f_A x f_B times. The kernel must answer
    // exactly and fast (O(|A|+|B|) states/transitions — at this size
    // the matrix would hold 22.5M match cells; the automaton of a
    // single repeated run is ~2 states per length).
    val tail = IndexedSeq("alpha", "ending", "one")
    val a = IndexedSeq.fill(5000)("spam") ++ tail
    val b = IndexedSeq.fill(4500)("spam") ++ tail
    val t0 = System.nanoTime()
    val got = graft.functions.LongestCommonRun(a, b)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(got == (4503, 501, 1), got)
    // generous bound — the point is "not quadratic-materializing",
    // not a micro-benchmark (the DP below takes ~100x longer)
    assert(ms < 2000, s"kernel took ${ms}ms on a 5k-token pair")
    assert(lcsRun(a, b) == got)

    // mixed adversarial shapes: high-frequency token + structure
    val c = (0 until 400).flatMap(i =>
      Seq("x", "x", if (i % 7 == 0) "y" else "z"))
    val d = (0 until 350).flatMap(i =>
      Seq("x", if (i % 5 == 0) "y" else "z", "x"))
    assert(graft.functions.LongestCommonRun(
      c.toIndexedSeq, d.toIndexedSeq) == lcsRun(c.toIndexedSeq,
      d.toIndexedSeq))

    // degenerate edges
    assert(graft.functions.LongestCommonRun(
      IndexedSeq.empty, IndexedSeq("a")) == (0, 0, 0))
    assert(graft.functions.LongestCommonRun(
      IndexedSeq("a"), IndexedSeq.empty) == (0, 0, 0))
    assert(graft.functions.LongestCommonRun(
      IndexedSeq("a", "b"), IndexedSeq("c", "d")) == (0, 0, 0))
    assert(graft.functions.LongestCommonRun(
      IndexedSeq("a"), IndexedSeq("a")) == (1, 1, 1))
  }

  // independent coverage recomputation: full match-matrix DP, collect
  // every MAXIMAL run (terminal cell: next tokens mismatch or an end),
  // keep >= minLen, emit b-side intervals, union-merge
  private def dpCoverage(a: IndexedSeq[String], b: IndexedSeq[String],
      minLen: Int): Seq[(Int, Int)] = {
    val iv = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val m = Array.ofDim[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      var prevDiag = 0
      var j = 1
      while (j <= b.length) {
        val tmp = m(j)
        m(j) = if (a(i - 1) == b(j - 1)) prevDiag + 1 else 0
        prevDiag = tmp
        if (m(j) >= minLen &&
            (i == a.length || j == b.length || a(i) != b(j)))
          iv += ((j - m(j) + 1, j))
        j += 1
      }
      i += 1
    }
    val sorted = iv.sortBy(identity)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    sorted.foreach { case (s, e) =>
      if (out.nonEmpty && s <= out.last._2 + 1) {
        val (ls, le) = out.last
        out(out.length - 1) = (math.min(ls, s), math.max(le, e))
      } else out += ((s, e))
    }
    out.toSeq
  }

  test("coverage kernel equals DP maximal-run coverage (randomized + adversarial)") {
    // adversarial repeated-token pair: B is fully covered
    val tail = IndexedSeq("alpha", "ending", "one")
    val a = IndexedSeq.fill(420)("spam") ++ tail
    val b = IndexedSeq.fill(380)("spam") ++ tail
    assert(graft.functions.LongestCommonRun.coverage(a, b, 12) ==
      Seq((1, 383)))
    assert(graft.functions.LongestCommonRun.coverage(b, a, 12) ==
      dpCoverage(b, a, 12).map(x => x).toSeq.sorted)
    assert(graft.functions.LongestCommonRun.coverage(b, a, 12) ==
      Seq((1, 423)))

    // below-threshold pairs emit nothing
    assert(graft.functions.LongestCommonRun.coverage(
      IndexedSeq.fill(11)("x"), IndexedSeq.fill(11)("x"), 12).isEmpty)

    // randomized small-alphabet trials at a small threshold
    val rnd = new scala.util.Random(13L)
    (0 until 300).foreach { trial =>
      val alpha = Array("a", "b", "c").take(1 + rnd.nextInt(3))
      val n = 1 + rnd.nextInt(50)
      val mm = 1 + rnd.nextInt(50)
      val x = IndexedSeq.fill(n)(alpha(rnd.nextInt(alpha.length)))
      val y = IndexedSeq.fill(mm)(alpha(rnd.nextInt(alpha.length)))
      val minLen = 1 + rnd.nextInt(6)
      val got = graft.functions.LongestCommonRun.coverage(x, y, minLen)
      val exp = dpCoverage(x, y, minLen)
      assert(got == exp,
        s"trial $trial minLen=$minLen: kernel $got vs DP $exp\n" +
          s" a=${x.mkString}\n b=${y.mkString}")
    }
  }

  test("kernel equals the DP on randomized small-alphabet pairs (tie order included)") {
    // small alphabets force heavy repetition and dense tie classes —
    // the regime where a wrong minEnd propagation or tie rule shows
    val rnd = new scala.util.Random(20260816L)
    (0 until 300).foreach { trial =>
      val alpha = Array("a", "b", "c").take(1 + rnd.nextInt(3))
      val n = 1 + rnd.nextInt(40)
      val m = 1 + rnd.nextInt(40)
      val a = IndexedSeq.fill(n)(alpha(rnd.nextInt(alpha.length)))
      val b = IndexedSeq.fill(m)(alpha(rnd.nextInt(alpha.length)))
      val got = graft.functions.LongestCommonRun(a, b)
      val exp = lcsRun(a, b)
      assert(got == exp,
        s"trial $trial: kernel $got vs DP $exp\n a=$a\n b=$b")
    }
  }
}
