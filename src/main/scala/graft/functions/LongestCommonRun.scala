package graft.functions

/** Longest-common-run and run-coverage kernels over two token
  * sequences in O(|A| + |B|) — the production primitives behind
  * dedup_pair_longest_run and dedup_doc_token_spans (Lee et al.
  * ACL'22's longest-match machinery, per candidate pair).
  *
  * Construction: a suffix automaton of A's token sequence (Blumer et
  * al. 1985; the standard online construction, over a per-pair interned
  * integer alphabet), then one left-to-right match of B through it
  * maintaining the classic (state, length) pair. The longest common
  * substring is the maximum match length; the tie order the SQL
  * diagonal-island form defines (max run_len, then min a_start, then
  * min b_start) is recovered exactly from per-state MINIMUM end
  * positions, propagated up the suffix-link tree: for the maximal
  * length L, every length-L matching window IS a maximal diagonal run
  * (a longer containing run would contradict maximality of L), so the
  * minimal a_start over states reached at length L, then the minimal
  * b_end whose state still contains that occurrence, reproduce the
  * island ordering without materializing a single match cell.
  *
  * Why these kernels exist: the equi-join match matrix is |shared
  * tokens| for genuine near-dup pairs but O(f_A * f_B) PER REPEATED
  * TOKEN for adversarial inputs (two docs that are mostly one token
  * repeated shuffle f_A*f_B rows for that token). Here the same pair
  * costs 2|A| states + |B| transitions, flat. The SQL forms remain the
  * oracle-checkable twins; DedupLongestRunSpec cross-checks both
  * kernels against independent O(n*m) DPs, including adversarial
  * repeated-token pairs.
  */
object LongestCommonRun {

  /** suffix automaton of `ai`: parallel arrays + per-state transition
    * maps; minEnd holds each state's minimum end position (0-based)
    * after [[propagateMinEnd]]
    */
  private final class Sam(n: Int) {
    val cap: Int = 2 * n + 2
    val len = new Array[Int](cap)
    val link = new Array[Int](cap)
    val minEnd = new Array[Int](cap)
    val trans = new Array[java.util.HashMap[Integer, Integer]](cap)
    var size = 1
    java.util.Arrays.fill(minEnd, Int.MaxValue)
    trans(0) = new java.util.HashMap[Integer, Integer](4)
    link(0) = -1
  }

  private def build(ai: Array[Int]): Sam = {
    val n = ai.length
    val s = new Sam(n)
    import s._
    var last = 0
    var pos = 0
    while (pos < n) {
      val c = Integer.valueOf(ai(pos))
      val cur = size; size += 1
      len(cur) = len(last) + 1
      minEnd(cur) = pos
      trans(cur) = new java.util.HashMap[Integer, Integer](4)
      var p = last
      while (p != -1 && !trans(p).containsKey(c)) {
        trans(p).put(c, Integer.valueOf(cur))
        p = link(p)
      }
      if (p == -1) link(cur) = 0
      else {
        val q = trans(p).get(c).intValue()
        if (len(p) + 1 == len(q)) link(cur) = q
        else {
          val clone = size; size += 1
          len(clone) = len(p) + 1
          link(clone) = link(q)
          trans(clone) =
            new java.util.HashMap[Integer, Integer](trans(q))
          val qv = Integer.valueOf(q)
          val cv = Integer.valueOf(clone)
          var pp = p
          while (pp != -1 && qv.equals(trans(pp).get(c))) {
            trans(pp).put(c, cv)
            pp = link(pp)
          }
          link(q) = clone
          link(cur) = clone
        }
      }
      last = cur
      pos += 1
    }
    s
  }

  /** propagate minimum end positions up the suffix-link tree (counting
    * sort by len — the standard endpos aggregation order)
    */
  private def propagateMinEnd(s: Sam, n: Int): Unit = {
    import s._
    val cnt = new Array[Int](n + 2)
    var i = 1
    while (i < size) { cnt(len(i)) += 1; i += 1 }
    i = 1
    while (i <= n) { cnt(i) += cnt(i - 1); i += 1 }
    val byLen = new Array[Int](size - 1)
    i = 1
    while (i < size) {
      cnt(len(i)) -= 1; byLen(cnt(len(i))) = i; i += 1
    }
    i = byLen.length - 1
    while (i >= 0) {
      val v = byLen(i)
      val lp = link(v)
      if (lp > 0 && minEnd(v) < minEnd(lp)) minEnd(lp) = minEnd(v)
      i -= 1
    }
  }

  /** intern both docs' tokens into A's dense alphabet; B tokens absent
    * from A map to -1 (a guaranteed match reset)
    */
  private def intern(a: IndexedSeq[String], b: IndexedSeq[String])
      : (Array[Int], Array[Int]) = {
    val dict = new java.util.HashMap[String, Integer](a.length * 2)
    val ai = new Array[Int](a.length)
    var i = 0
    while (i < a.length) {
      var id = dict.get(a(i))
      if (id == null) {
        id = Integer.valueOf(dict.size()); dict.put(a(i), id)
      }
      ai(i) = id.intValue()
      i += 1
    }
    val bi = new Array[Int](b.length)
    i = 0
    while (i < b.length) {
      val id = dict.get(b(i))
      bi(i) = if (id == null) -1 else id.intValue()
      i += 1
    }
    (ai, bi)
  }

  /** one pass of B through the automaton: per position, the longest
    * match ending there (lArr) and the state representing it (vArr)
    */
  private def matchB(s: Sam, bi: Array[Int])
      : (Array[Int], Array[Int]) = {
    import s._
    val m = bi.length
    val lArr = new Array[Int](m)
    val vArr = new Array[Int](m)
    var v = 0
    var l = 0
    var pos = 0
    while (pos < m) {
      val ci = bi(pos)
      if (ci < 0) { v = 0; l = 0 }
      else {
        val c = Integer.valueOf(ci)
        while (v != 0 && !trans(v).containsKey(c)) {
          v = link(v); l = len(v)
        }
        val nxt = trans(v).get(c)
        if (nxt != null) { v = nxt.intValue(); l += 1 }
        else { v = 0; l = 0 }
      }
      lArr(pos) = l
      vArr(pos) = v
      pos += 1
    }
    (lArr, vArr)
  }

  /** @return (run_len, a_start, b_start), starts 1-based; (0, 0, 0)
    *         when the docs share no token
    */
  def apply(a: IndexedSeq[String], b: IndexedSeq[String])
      : (Int, Int, Int) = {
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0) return (0, 0, 0)
    val (ai, bi) = intern(a, b)
    val sam = build(ai)
    propagateMinEnd(sam, n)
    val (lArr, vArr) = matchB(sam, bi)
    var best = 0
    var pos = 0
    while (pos < m) {
      if (lArr(pos) > best) best = lArr(pos)
      pos += 1
    }
    if (best == 0) return (0, 0, 0)
    // tie order: min a_start over all length-best windows, then min
    // b_start among the positions whose state occurs at that a_start
    var aEndMin = Int.MaxValue
    pos = 0
    while (pos < m) {
      if (lArr(pos) == best && sam.minEnd(vArr(pos)) < aEndMin)
        aEndMin = sam.minEnd(vArr(pos))
      pos += 1
    }
    var bEndMin = -1
    pos = 0
    while (bEndMin < 0 && pos < m) {
      if (lArr(pos) == best && sam.minEnd(vArr(pos)) == aEndMin)
        bEndMin = pos
      pos += 1
    }
    (best, aEndMin - best + 2, bEndMin - best + 2)
  }

  /** B-side COVERAGE of maximal common runs of at least `minLen`
    * tokens: the merged, 1-based inclusive intervals of every B
    * position lying inside a common run with A of length >= minLen.
    * Identity used (and why no occurrence enumeration is needed): the
    * union of suffix windows [pos - l(pos) + 1, pos] over positions
    * with l(pos) >= minLen EQUALS the union of the b-intervals of all
    * maximal runs >= minLen — every maximal run's own end position
    * contributes a window covering it, and every window sits inside
    * the maximal run extending its match. Windows arrive ordered by
    * end, so one forward sweep merges them (ends are monotone; a
    * window reaching further back than the open interval's start
    * still overlaps it, because it also covers the open end).
    */
  def coverage(a: IndexedSeq[String], b: IndexedSeq[String],
      minLen: Int): Seq[(Int, Int)] = {
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0) return Seq.empty
    val (ai, bi) = intern(a, b)
    val sam = build(ai)
    val (lArr, _) = matchB(sam, bi)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var s = -1
    var e = -1
    var pos = 0
    while (pos < m) {
      val l = lArr(pos)
      if (l >= minLen) {
        val ws = pos - l + 2 // 1-based window start
        val we = pos + 1 // 1-based window end
        if (s < 0) { s = ws; e = we }
        else if (ws <= e + 1) { if (ws < s) s = ws; e = we }
        else { out += ((s, e)); s = ws; e = we }
      }
      pos += 1
    }
    if (s >= 0) out += ((s, e))
    out.toSeq
  }
}
