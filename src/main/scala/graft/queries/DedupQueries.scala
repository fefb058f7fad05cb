package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextFns._

/** Deduplication surface for the training-data-pipeline use case: exact
  * (hash) dedup, MinHash+LSH near-dup detection, SimHash, and n-gram
  * Jaccard.
  *
  * The MinHash pipeline is the scale path: per-doc signature computation
  * is narrow (ONE md5 per shingle; the 16 hash functions are affine
  * transforms of that one value, so signatures cost arithmetic, not
  * hashing); candidate generation groups band keys and explodes pairs
  * from the collected bucket — O(#docs * #bands) small rows and a single
  * pass over the signature lineage, never an O(n²) self-join of the
  * expensive side. The exact-Jaccard verify join touches only candidate
  * pairs. That is the standard LSH banding argument and it survives
  * 100 TB: no stage is quadratic in corpus size.
  *
  * All hashing is md5-derived integer arithmetic (md5 is bit-identical
  * in Spark and DuckDB, and every intermediate stays < 2^62 so neither
  * engine overflows) — the LSH internals themselves are oracle-checked.
  */
object DedupQueries {

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand = NumHashes / Bands

  /** Mersenne prime 2^31−1; affine minhash functions h_i(v)=(a_i·v+b_i) mod P */
  val P = 2147483647L
  private def aCoef(i: Int): Long = 2L * i + 3
  private def bCoef(i: Int): Long = 104729L * i + 12345

  /** 128-bit window key: TWO independent xxhash64 passes (seeds 42/43)
    * over the token slice — replaces md5(array_join(slice, ' ')) in the
    * shared-window INTERNALS (r13, guide §2.3 "shuffle fewer bytes"):
    * no per-window string materialization, no crypto hash, and the
    * shuffled key is 16 bytes instead of a 32-char string. Collision
    * safety stays at md5's 128 bits (the 100 TB exactness argument —
    * a single 64-bit key would birthday-collide ~1e7 times at 2e13
    * windows). The DuckDB twins keep md5: the hash values never reach
    * any output, only the induced shared-window SETS must agree, and
    * both keys are collision-free over the data.
    */
  private def winKey2(sl: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      new org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(org.apache.spark.sql.GraftSqlBridge.expression(sl)), 43L))

  // ---- Spark side ----------------------------------------------------

  /** doc_id + token list (cleaned). */
  private def toks(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.NormTokens.column(col("text")).as("tok"))

  /** [[toks]] above the persisted spread ([[Tables.spread]]) — for the
    * MEMOIZED one-time builders only (minhash signatures, winnow
    * fingerprints, the AllPairs gram index): their per-doc kernels are
    * the heavy part and a single-row-group scan would run them in one
    * task. Per-query lineages keep the scan-shaped [[toks]].
    */
  private def toksSpread(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.NormTokens.column(col("text")).as("tok"))

  /** Tokens for ONLY the given doc ids: the broadcast semi-join runs on
    * the raw relation BEFORE the tokenize projection. Order matters —
    * Catalyst does not push a semi-join below a Project, so
    * `toks(..).join(semi)` tokenizes the whole corpus and discards most
    * of it; this shape tokenizes survivors only (verified in PlanSpec).
    */
  private def toksFor(s: SparkSession, dir: String,
      ids: DataFrame): DataFrame =
    Tables.t(s, dir, "documents")
      .join(broadcast(ids), Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        graft.functions.NormTokens.column(col("text")).as("tok"))

  /** 3-token shingles; whole text as a single shingle when too short
    * (coalesce: a NULL token array yields the single empty shingle, the
    * oracle's coalesce(array_to_string(tok,' '),'') branch). Only used
    * for the bounded candidate-verify sets — the corpus-wide signature
    * pass fuses shingling into the MinHashShingleSig kernel instead.
    */
  private val shingleCol: Column =
    when(size(col("tok")) >= 3,
      transform(sequence(lit(1), size(col("tok")) - 2), i =>
        concat_ws(" ", element_at(col("tok"), i),
          element_at(col("tok"), i + 1), element_at(col("tok"), i + 2))))
      .otherwise(array(coalesce(array_join(col("tok"), " "), lit(""))))

  /** distinct 3-token shingle sets for a pre-filtered token frame — THE
    * one construction shared by the minhash verify stage
    * (buildMinhashPairs), dedup_containment and dedup_minhash_recall
    * (with [[shingleSqlExpr]] as its oracle twin). The recall query's
    * precision-1.0 invariant holds only while every consumer uses
    * exactly this definition.
    */
  private def shingleSets(toksDf: DataFrame): DataFrame =
    toksDf.withColumn("sh", shingleCol)
      .select(col("doc_id"), array_distinct(col("sh")).as("st"))

  /** The verified J >= 0.5 pair set (a_id < b_id, exact jaccard) —
    * the whole-corpus AllPairs/PPJoin join, extracted so
    * dedup_prefix_jaccard (the pair listing) and dedup_nearest_dup
    * (the per-doc nearest-duplicate report) share one construction.
    * Memoized + persisted per (session, dir) — the minhash-pairs
    * convention for two-consumer lineages, and shared-warm-listed in
    * [[warmShared]] like ccLabels/exactTruthPairs/prefixSorted: the
    * verified pair set is the offline artifact a production dedup
    * pipeline stages once and serves many lookups from, so Bench
    * charges its one materialization to shared_warm_sec instead of
    * whichever consumer alphabetically runs first (round 8 charged
    * ~4.7 s of it to dedup_nearest_dup). Verify still builds it cold
    * inside the query. The frame is output-sized (true near-dup
    * pairs). See dedup_prefix_jaccard's header comment for the
    * algorithm.
    */
  private def prefixJaccardPairs(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.memo("dedup_prefix_pairs", s, d)(
      graft.CacheRegistry.track(s, buildPrefixJaccardPairs(s, d)))

  private def buildPrefixJaccardPairs(s: SparkSession, d: String): DataFrame = {

        // AQE's byte-targeted coalescing is WRONG for this query: its
        // shuffles are tiny in bytes (pairs of longs; ~13 MB at sf0.1)
        // but CPU-dense per row, and AQE collapsed the verify stream to
        // 4 tasks (38 of the query's 44 s). The CPU-heavy exchanges pin
        // the session's configured shuffle parallelism explicitly —
        // a user-specified repartition width is exempt from coalescing.
        val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
        val sorted = prefixSorted(s, d)
        // PROBE prefix length for J >= 0.5: n - ceil(t*n) + 1
        // = n - ceil(n/2) + 1 (integer form)
        val plen = col("n") - floor((col("n") + 1) / 2).cast("int") + 1
        val pfx = sorted.select(col("doc_id"), col("n"), col("sig"),
          posexplode(slice(col("sg"), lit(1), plen)).as(Seq("i0", "gram")))
          .select(col("doc_id"), col("n"), col("sig"),
            (col("i0") + 1).as("i"), col("gram"))
        // INDEX prefix (AllPairs asymmetry, Bayardo WWW'07 §3.1): under
        // the canonical (n, doc_id) processing order the SMALLER doc of
        // a pair only needs its first n - ceil(2t/(1+t)*n) + 1 grams
        // indexed (t=0.5: n - ceil(2n/3) + 1 ~ n/3, vs the probe's
        // ~n/2). Lemma: J >= t with nx <= ny forces overlap
        // >= alpha = ceil(t/(1+t)*(nx+ny)), and an overlap-alpha pair
        // must share a gram inside prefix(nx-alpha+1) x prefix
        // (ny-alpha+1); alpha >= ceil(2t/(1+t)*nx) bounds the index
        // side and alpha >= ceil(t*ny) (via nx >= t*ny) the probe side.
        // The index prefix is by construction a PREFIX of the probe
        // prefix, so it derives as a position filter — no second
        // explode. PrefixJaccardSpec brute-force-checks completeness
        // across the J~0.5 boundary; the DuckDB oracle deliberately
        // keeps the SYMMETRIC two-probe-prefix form, so the gate
        // cross-checks the tightened filter against an independently
        // complete candidate scheme.
        val ilen = col("n") - floor((col("n") * 2 + 2) / 3).cast("int") + 1
        val idx = pfx.filter(col("i") <= ilen)
        // PPJoin positional filter (Xiao et al. WWW'08): a shared gram
        // at 1-based positions (i, j) bounds the overlap by
        // min(i-1, j-1) + 1 + min(na-i, nb-j) — common grams strictly
        // before it, itself, common grams after. J >= 0.5 needs
        // overlap >= ceil((na+nb)/3); every shared-gram row of a TRUE
        // pair satisfies the bound (it upper-bounds the actual
        // overlap), so dropping failing rows loses no pair.
        val alpha = floor((col("a.n") + col("b.n") + 2) / 3)
        // every join below hints shuffle_hash: the prefix table and the
        // gram-array table are both CORPUS-SIZED, and Catalyst's size
        // estimate under Generate(explode) is low enough that it chose
        // to BROADCAST them — fine at sf0.1 (3 MB), an OOM at the 30x
        // probe (a ~6M-row exploded broadcast), and wrong at 100 TB by
        // definition. Shuffle-hash keys the pair join on gram and the
        // verify on doc_id; per-partition builds are corpus/nPart.
        val cand = idx.as("a")
          .join(pfx.hint("shuffle_hash").as("b"),
            col("a.gram") === col("b.gram") &&
              // canonical order: the index side is the smaller doc
              (col("a.n") < col("b.n") ||
                (col("a.n") === col("b.n") &&
                  col("a.doc_id") < col("b.doc_id"))) &&
              // size filter: J >= 0.5 forces the larger <= 2x smaller
              col("b.n") <= col("a.n") * 2 &&
              least(col("a.i") - 1, col("b.i") - 1) + 1 +
                least(col("a.n") - col("a.i"), col("b.n") - col("b.i"))
                >= alpha &&
              // suffix filter: the count-sketch overlap bound must
              // still clear alpha — evaluated last (the 256-byte merge
              // runs only on rows the cheap scalar filters pass)
              graft.functions.SigOverlapBound.column(
                col("a.sig"), col("b.sig")) >= alpha)
          .select(least(col("a.doc_id"), col("b.doc_id")).as("a_id"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("b_id"))
          .repartition(nPart, col("a_id"), col("b_id"))
          .distinct()
        // TWO-PASS verify. The exact merge-kernel verify over sorted
        // STRING gram arrays already replaced size(array_intersect)'s
        // per-row hash-set build (33 s -> ~2 s at sf0.1), but shipping
        // a ~2 KB string array with every candidate row through the
        // second doc_id exchange was still ~8 of the query's ~13 s on
        // the adversarial corpus (4.8M candidates for 256 true pairs).
        // Pass 1 PRESCREENS on sorted xxhash64 gram arrays — 8 bytes
        // per gram in the exchange, primitive compares in the kernel.
        // No exactness is given up: the multiset hash intersection can
        // only OVERcount the string intersection (each shared gram
        // fills one matching hash slot on both sides), so
        // J_hash >= J_true and the 3*ih >= na+nb cut (algebraically
        // J_hash >= 0.5) admits every true pair. Pass 2 exact-verifies
        // the surviving pairs on the true string arrays — a
        // survivor-sized frame joined against the corpus arrays, which
        // never re-enters a corpus-wide exchange carrying payload.
        // ghash/gsort both derive from `sorted` rather than re-running
        // the scan+tokenize+bigram lineage: sg IS the gram set (just
        // df-ordered), so re-sorting it is a per-row array_sort while
        // the lineage below the doc_id repartition is byte-identical
        // across all three consumers and AQE reuses that exchange —
        // measured 2x the whole query at sf0.1 (the three corpus
        // tokenizes were ~6 of 6.6 s once the suffix filter shrank
        // everything downstream).
        val ghash = sorted.select(col("doc_id"),
          array_sort(transform(col("sg"), x => xxhash64(x))).as("gh"),
          col("n").as("ng"))
          .hint("shuffle_hash")
        val ih = graft.functions.SortedIntersectSizeLong.column(
          col("ha"), col("hb"))
        // the repartition pins the CPU-dense pair stream's parallelism;
        // the PERSIST below is what makes the candidate join run ONCE.
        // The survivors subtree has FIVE downstream references (the
        // final verify join plus both survivor-id branches, each
        // appearing under both gsort sides) and AQE stage reuse does
        // NOT deduplicate them — the round-7 claim that it did was
        // wrong: the stage profile showed the whole prefix explode +
        // 9M-row candidate join executing five times (~30 s CPU of the
        // query's ~60 s at sf0.1). The frame is output-sized (true
        // pairs + prescreen stragglers — 256 rows of two longs here),
        // so persisting it is the cheapest operation in the query; it
        // is registered per-build with CacheRegistry so clear()
        // releases it.
        val survivors = graft.CacheRegistry.track(s, cand
          .join(ghash.select(col("doc_id").as("a_id"), col("gh").as("ha"),
            col("ng").as("na")), "a_id")
          .join(ghash.select(col("doc_id").as("b_id"), col("gh").as("hb"),
            col("ng").as("nb")), "b_id")
          .filter(ih * 3 >= col("na") + col("nb"))
          .select(col("a_id"), col("b_id"))
          .repartition(nPart, col("a_id"), col("b_id")))
        // pass 2 sorts the string arrays of ONLY survivor docs (the
        // semi-join prune pattern, shuffle-hash because survivor counts
        // scale with the corpus's true duplicate mass) — reading the
        // same reused exchange as ghash instead of a third corpus-wide
        // tokenize, which the salted 10x/30x probes measured as the
        // dominant cost
        val survIds = survivors.select(col("a_id").as("doc_id"))
          .union(survivors.select(col("b_id").as("doc_id")))
          .distinct()
          .hint("shuffle_hash")
        val gsort = sorted
          .join(survIds, Seq("doc_id"), "left_semi")
          .select(col("doc_id"),
            array_sort(col("sg")).as("gs"), col("n").as("ng"))
          .hint("shuffle_hash")
        val inter = graft.functions.SortedIntersectSize.column(
          col("ga"), col("gb"))
        survivors
          .join(gsort.select(col("doc_id").as("a_id"), col("gs").as("ga"),
            col("ng").as("na")), "a_id")
          .join(gsort.select(col("doc_id").as("b_id"), col("gs").as("gb"),
            col("ng").as("nb")), "b_id")
          .withColumn("inter", inter)
          .withColumn("uni",
            greatest(col("na") + col("nb") - col("inter"), lit(1)))
          .filter(col("inter") * 2 >= col("uni"))
          .select(col("a_id"), col("b_id"),
            round(col("inter").cast("double") / col("uni"), 6).as("jaccard"))
  }

  /** DuckDB twin of [[prefixJaccardPairs]] + the deterministic order */
  private lazy val prefixJaccardSql: String =
    s"""WITH cleaned AS (
           |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
           |), toksrc AS (
           |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
           |), grams AS (
           |  SELECT doc_id, $bigramsSqlExpr AS g FROM toksrc
           |), posting AS (
           |  SELECT doc_id, unnest(g) AS gram FROM grams
           |), dfreq AS (
           |  SELECT gram, count(*) AS df FROM posting GROUP BY 1
           |), sorted AS (
           |  SELECT p.doc_id,
           |    list_transform(list_sort(list({'df': d.df, 'g': p.gram})),
           |      x -> x.g) AS sg
           |  FROM posting p JOIN dfreq d USING (gram) GROUP BY p.doc_id
           |), pfx0 AS (
           |  SELECT doc_id, len(sg) AS n,
           |    unnest(list_transform(
           |      sg[1:(len(sg) - (len(sg) + 1) // 2 + 1)],
           |      (x, ix) -> {'g': x, 'ix': ix})) AS u
           |  FROM sorted
           |), pfx AS (
           |  SELECT doc_id, n, u.ix AS i, u.g AS gram FROM pfx0
           |), cand AS (
           |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
           |  FROM pfx a JOIN pfx b ON a.gram = b.gram
           |    AND a.doc_id < b.doc_id AND b.n <= a.n * 2 AND a.n <= b.n * 2
           |    AND least(a.i - 1, b.i - 1) + 1
           |      + least(a.n - a.i, b.n - b.i) >= (a.n + b.n + 2) // 3
           |), v AS (
           |  SELECT c.a_id, c.b_id,
           |    len(list_filter(ga.g, x -> list_contains(gb.g, x))) AS inter,
           |    len(ga.g) AS la, len(gb.g) AS lb
           |  FROM cand c
           |  JOIN grams ga ON ga.doc_id = c.a_id
           |  JOIN grams gb ON gb.doc_id = c.b_id
           |)
           |SELECT a_id, b_id,
           |  round(CAST(inter AS DOUBLE)
           |    / greatest(la + lb - inter, 1), 6) AS jaccard
           |FROM v
           |WHERE inter * 2 >= greatest(la + lb - inter, 1)
           |ORDER BY a_id, b_id""".stripMargin

  /** Ground-truth near-dup pairs on the bounded doc_id < 150 eval
    * block: exact all-pairs 3-shingle Jaccard >= 0.5 — the single
    * definition dedup_minhash_recall, dedup_winnow_recall and
    * dedup_cc_bcubed all evaluate against (one truth so the detector
    * scores are comparable). The quadratic join is confined to the
    * 150-doc block by construction. Memoized + persisted per (session,
    * dir) — three consumers, the minhash/winnow-pairs convention — and
    * the intersection runs the SortedIntersectSize merge kernel over
    * pre-sorted distinct shingle arrays (identical value to
    * size(array_intersect), measured ~3x the built-in here).
    */
  private def exactTruthPairs(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.memo("dedup_truth_pairs", s, d)(
      graft.CacheRegistry.track(s, {
        val sets = shingleSets(toks(s, d).filter(col("doc_id") < 150))
          .select(col("doc_id"), array_sort(col("st")).as("st"))
        sets.select(col("doc_id").as("a_id"), col("st").as("sa"))
          .join(sets.select(col("doc_id").as("b_id"), col("st").as("sb")),
            col("a_id") < col("b_id"))
          .withColumn("inter",
            graft.functions.SortedIntersectSize.column(
              col("sa"), col("sb")))
          .filter(col("inter").cast("double") /
            greatest(size(col("sa")) + size(col("sb")) - col("inter"),
              lit(1)) >= 0.5)
          .select("a_id", "b_id")
      }))

  /** distinct word-bigram set per doc — the gram shape shared by
    * dedup_ngram_jaccard (bounded all-pairs eval block) and
    * dedup_prefix_jaccard (whole-corpus prefix-filtered join), one
    * definition so the exact baseline and the scalable join can never
    * diverge on what a "gram" is. Short docs (< 2 tokens) fall back to
    * the raw token list, mirroring [[bigramsSqlExpr]].
    */
  private def bigramSets(toksDf: DataFrame): DataFrame =
    toksDf.select(col("doc_id"),
      array_distinct(when(size(col("tok")) >= 2,
        transform(sequence(lit(1), size(col("tok")) - 1), i =>
          concat_ws(" ", element_at(col("tok"), i),
            element_at(col("tok"), i + 1))))
        .otherwise(col("tok"))).as("g"))

  /** DuckDB twin of [[bigramSets]]'s gram expression over a `tok` column */
  private val bigramsSqlExpr: String =
    "list_distinct(CASE WHEN len(tok) >= 2 " +
      "THEN list_transform(range(1, len(tok)), i -> tok[i] || ' ' || tok[i+1]) " +
      "ELSE tok END)"

  /** DuckDB twin of [[shingleCol]] over a `tok` column */
  private def shingleSqlExpr: String =
    "CASE WHEN len(tok) >= 3 " +
      "THEN list_transform(range(1, len(tok) - 1), " +
      "i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]) " +
      "ELSE [coalesce(array_to_string(tok, ' '), '')] END"

  /** all 16 minima in ONE pass via the native codegen'd kernel
    * (graft.functions.MinHashSig): one md5 per shingle, affine mins in a
    * tight JVM loop — h_i(v) = (v*(2i+3) + 104729i + 12345) mod P, the
    * aCoef/bCoef family, bit-identical to the oracle's positional-hex
    * arithmetic (DedupSpec pins kernel == SQL-expression equality)
    */
  private def minhash(i: Int): Column =
    element_at(col("mh"), i + 1).as(s"h$i")

  private def bandKey(b: Int): Column =
    md5(concat_ws("|",
      (0 until RowsPerBand).map(r => col(s"h${b * RowsPerBand + r}")): _*))

  /** Band buckets bigger than this are dropped from candidate
    * generation (standard LSH practice: an oversized bucket means the
    * band carries no discriminating power for those rows, and exploding
    * it is quadratic). With the exact-dup pre-pass below, buckets hold
    * at most one entry per DISTINCT content, so real corpora never get
    * near the cap — it is a guard against adversarial many-distinct-
    * but-band-identical inputs, mirrored in the oracle.
    */
  val MaxBucket = 64

  /** memoized + persisted per (session, dir) via CacheRegistry:
    * dedup_minhash_pairs and dedup_minhash_survivors both consume this
    * lineage, and the FINAL pair set is persisted so the second consumer
    * reuses materialized rows, not just a plan (a write action re-plans
    * its own RDD lineage, so plan-level memoization alone reuses
    * nothing). Input dirs are assumed immutable for the cache lifetime;
    * the harness releases everything via CacheRegistry.clear.
    */
  private def minhashPairs(s: SparkSession, dir: String): DataFrame =
    graft.CacheRegistry.memo("dedup_minhash_pairs", s, dir)(
      buildMinhashPairs(s, dir))

  /** Maximal duplicated spans per doc (the Lee et al. ACL'22 span
    * output, doc-merge form): every shared 12-token window START
    * (hash in >= 2 distinct docs) marks tokens [i, i+11] duplicated;
    * a span is a maximal contiguous region of duplicated TOKENS, i.e.
    * the interval merge of the [i, i+11] covers. Because cover ends
    * are monotone in i, interval merge reduces to gaps-and-islands on
    * the starts with threshold W: starts i, i' belong to one span iff
    * i' - i <= W (cover [i', i'+11] overlaps or abuts [i, i+11]). A
    * start-space run merge alone (grp = i - rownum) is WRONG here —
    * shared starts 1 and 3 would emit token-overlapping spans [1,12]
    * and [3,14], double-counting tokens 3..12 in every sum — so the
    * islands are lag-gap based, and the emitted spans are provably
    * token-disjoint (next span_start > prev span_end + 1), each fully
    * covered (within an island consecutive covers overlap-or-abut),
    * hence sum(span_len) is the EXACT duplicated-token coverage.
    * PARTITIONED windows only. Memoized + persisted: dedup_span_
    * savings and dedup_substring_spans share the lineage (bench order
    * charges the build to the alphabetically-first consumer,
    * dedup_span_savings — the minhash-pairs convention).
    */
  private def substringSpans(s: SparkSession, dir: String): DataFrame =
    graft.CacheRegistry.memo("dedup_substr_spans", s, dir)(
      graft.CacheRegistry.track(s, {
        val W = 12
        val pos = toks(s, dir)
          .filter(size(col("tok")) >= W)
          .select(col("doc_id"),
            explode(transform(
              sequence(lit(1), size(col("tok")) - (W - 1)),
              i => struct(i.as("i"),
                xxhash64(slice(col("tok"), i, lit(W))).as("wh1"),
                winKey2(slice(col("tok"), i, lit(W))).as("wh2"))))
              .as("p"))
          .select(col("doc_id"), col("p.i").as("i"),
            col("p.wh1").as("wh1"), col("p.wh2").as("wh2"))
        val shared = pos.groupBy("wh1", "wh2")
          .agg(countDistinct(col("doc_id")).as("n_docs"))
          .filter(col("n_docs") >= 2)
          .select("wh1", "wh2")
        val sp = pos.join(shared, Seq("wh1", "wh2"), "left_semi")
        val wRun = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("i")
        // first row per doc: lag is NULL -> condition not true -> new run
        sp.withColumn("new_run",
            when(col("i") - lag(col("i"), 1).over(wRun) <= W, lit(0L))
              .otherwise(lit(1L)))
          .withColumn("grp", sum(col("new_run")).over(wRun))
          .groupBy(col("doc_id"), col("grp"))
          .agg(min(col("i")).as("span_start"),
            (max(col("i")) + (W - 1)).as("span_end"),
            (max(col("i")) - min(col("i")) + W).as("span_len"))
          .select(col("doc_id"),
            col("span_start").cast("int").as("span_start"),
            col("span_end").cast("int").as("span_end"),
            col("span_len").cast("int").as("span_len"))
      }))

  /** DuckDB twin of [[substringSpans]] — ends in a `spans` CTE with
    * (doc_id, span_start, span_end, span_len); `toksrc` stays in
    * scope for corpus-total denominators.
    */
  private lazy val spanCte: String =
    s"""cleaned AS (
       |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
       |), toksrc AS (
       |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
       |), w AS (
       |  SELECT doc_id, tok, len(tok) AS n FROM toksrc WHERE len(tok) >= 12
       |), pos AS (
       |  SELECT doc_id, CAST(i AS INT) AS i,
       |    md5(array_to_string(list_slice(tok, CAST(i AS INT),
       |      CAST(i AS INT) + 11), ' ')) AS wh
       |  FROM (SELECT doc_id, tok, unnest(range(1, n - 10)) AS i FROM w)
       |), hs AS (
       |  SELECT wh FROM pos GROUP BY wh
       |  HAVING count(DISTINCT doc_id) >= 2
       |), sp AS (
       |  SELECT p.doc_id, p.i FROM pos p JOIN hs USING (wh)
       |), runs AS (
       |  SELECT doc_id, i,
       |    CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)
       |      <= 12 THEN 0 ELSE 1 END AS new_run
       |  FROM sp
       |), islands AS (
       |  SELECT doc_id, i,
       |    sum(new_run) OVER (PARTITION BY doc_id ORDER BY i) AS grp
       |  FROM runs
       |), spans AS (
       |  SELECT doc_id, CAST(min(i) AS INT) AS span_start,
       |    CAST(max(i) + 11 AS INT) AS span_end,
       |    CAST(max(i) - min(i) + 12 AS INT) AS span_len
       |  FROM islands GROUP BY doc_id, grp
       |)""".stripMargin

  /** TOKEN-EXACT per-doc span frame — (doc_id, span_start, span_end,
    * span_len): for every doc in the minhash candidate pair set, the
    * merged 1-based intervals of every token inside a maximal common
    * run of >= 12 tokens with ANY of its partners, both sides of every
    * pair. Detection runs the suffix-automaton coverage kernel
    * (LongestCommonRun.coverage, O(|A|+|B|) per direction, per pair —
    * no match matrix, no repeated-token blowup); the per-doc union is
    * one doc_id-keyed window chain (running-max merge: overlapping AND
    * adjacent intervals coalesce — exactly the covered-position
    * islands). Memoized + persisted: dedup_doc_token_spans and
    * dedup_token_spans_applied share the lineage (bench order charges
    * the build to the alphabetically-first consumer). The frame is
    * output-sized: spans of candidate docs only.
    */
  private def docTokenSpans(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.memo("dedup_doc_token_spans", s, d)(
      // persisted AND plan-truncated (r13, the ConnectedComponents
      // pattern): the applied consumer embeds this frame three ways
      // (spans, span doc set, tokenize prune) and the un-truncated
      // lineage — minhash pairs + pair-grouped kernel + window merge —
      // re-analyzed as a ~600-Exchange Catalyst tree per consumer
      // (plans/r13/dedup_token_spans_applied_before.txt); both
      // consumers broadcast it explicitly, so the LogicalRDD's absent
      // size statistics change no join strategy
      org.apache.spark.sql.GraftSqlBridge.truncateLineage(
        graft.CacheRegistry.track(s, {
        import s.implicits._
        val pairs = minhashPairs(s, d).select("a_id", "b_id")
        val ids = pairs.select(col("a_id").as("doc_id"))
          .unionByName(pairs.select(col("b_id").as("doc_id"))).distinct()
        val ctoks = toksFor(s, d, ids)
        val intervals = pairs
          .join(ctoks.select(col("doc_id").as("a_id"),
            col("tok").as("atok")), Seq("a_id"))
          .join(ctoks.select(col("doc_id").as("b_id"),
            col("tok").as("btok")), Seq("b_id"))
          .select(col("a_id"), col("b_id"), col("atok"), col("btok"))
          .as[(Long, Long, Seq[String], Seq[String])]
          .mapPartitions(_.flatMap { case (aId, bId, atok, btok) =>
            val a = Option(atok).getOrElse(Seq.empty).toIndexedSeq
            val b = Option(btok).getOrElse(Seq.empty).toIndexedSeq
            graft.functions.LongestCommonRun.coverage(a, b, 12)
              .iterator.map { case (s0, e0) => (bId, s0, e0) } ++
              graft.functions.LongestCommonRun.coverage(b, a, 12)
                .iterator.map { case (s0, e0) => (aId, s0, e0) }
          })
          .toDF("doc_id", "s0", "e0")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("s0", "e0")
        val wPrev = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("s0", "e0")
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            -1)
        intervals
          .withColumn("new_run",
            when(col("s0") <=
              coalesce(max(col("e0")).over(wPrev), lit(-1)) + 1, lit(0L))
              .otherwise(lit(1L)))
          .withColumn("grp", sum(col("new_run")).over(w))
          .groupBy("doc_id", "grp")
          .agg(min(col("s0")).as("ss"), max(col("e0")).as("se"))
          .select(col("doc_id"), col("ss").cast("int").as("span_start"),
            col("se").cast("int").as("span_end"),
            (col("se") - col("ss") + 1).cast("int").as("span_len"))
      })))

  /** DuckDB twin of [[docTokenSpans]] — recomputes from the
    * diagonal-island match matrix (the declarative form the kernel
    * replaces): maximal runs >= 12 per (pair, diagonal), both sides'
    * intervals, the same running-max interval merge. Ends in
    * `dts_spans` (doc_id, span_start, span_end, span_len); `dts_tk`
    * (candidate tokens) stays in scope for the applied step.
    */
  private lazy val docTokenSpanCte: String =
    s"""dts_pairs AS (
       |  SELECT a_id, b_id FROM ($minhashSql)
       |), dts_ids AS (
       |  SELECT a_id AS doc_id FROM dts_pairs
       |  UNION SELECT b_id FROM dts_pairs
       |), dts_cl AS (
       |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
       |  WHERE doc_id IN (SELECT doc_id FROM dts_ids)
       |), dts_tk AS (
       |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM dts_cl
       |), dts_pos AS (
       |  SELECT doc_id, CAST(i AS INT) AS i, tok[CAST(i AS INT)] AS term
       |  FROM (SELECT doc_id, tok, unnest(range(1, len(tok) + 1)) AS i
       |        FROM dts_tk)
       |), dts_m AS (
       |  SELECT p.a_id, p.b_id, pa.i AS ai, pb.i AS bi,
       |    pa.i - pb.i AS diag
       |  FROM dts_pairs p
       |  JOIN dts_pos pa ON pa.doc_id = p.a_id
       |  JOIN dts_pos pb ON pb.doc_id = p.b_id AND pb.term = pa.term
       |), dts_r1 AS (
       |  SELECT *, CASE WHEN ai - lag(ai) OVER (
       |      PARTITION BY a_id, b_id, diag ORDER BY ai) = 1
       |    THEN 0 ELSE 1 END AS new_run
       |  FROM dts_m
       |), dts_r2 AS (
       |  SELECT *, sum(new_run) OVER (
       |      PARTITION BY a_id, b_id, diag ORDER BY ai) AS grp
       |  FROM dts_r1
       |), dts_runs AS (
       |  SELECT a_id, b_id, count(*) AS run_len,
       |    min(ai) AS a_s, min(bi) AS b_s
       |  FROM dts_r2 GROUP BY a_id, b_id, diag, grp
       |), dts_iv AS (
       |  SELECT b_id AS doc_id, CAST(b_s AS INT) AS s0,
       |    CAST(b_s + run_len - 1 AS INT) AS e0
       |  FROM dts_runs WHERE run_len >= 12
       |  UNION ALL
       |  SELECT a_id, CAST(a_s AS INT), CAST(a_s + run_len - 1 AS INT)
       |  FROM dts_runs WHERE run_len >= 12
       |), dts_mg AS (
       |  SELECT doc_id, s0, e0,
       |    CASE WHEN s0 <= coalesce(max(e0) OVER (
       |        PARTITION BY doc_id ORDER BY s0, e0
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      -1) + 1 THEN 0 ELSE 1 END AS new_run
       |  FROM dts_iv
       |), dts_g AS (
       |  SELECT *, sum(new_run) OVER (
       |      PARTITION BY doc_id ORDER BY s0, e0) AS grp
       |  FROM dts_mg
       |), dts_spans AS (
       |  SELECT doc_id, CAST(min(s0) AS INT) AS span_start,
       |    CAST(max(e0) AS INT) AS span_end,
       |    CAST(max(e0) - min(s0) + 1 AS INT) AS span_len
       |  FROM dts_g GROUP BY doc_id, grp
       |)""".stripMargin

  /** STAR-edge representation of the same duplicate graph the expanded
    * pair set describes: (canonical → member) within each exact-dup
    * group plus the banded (canonical → canonical) near-dup pairs.
    * Registered as a side effect of [[buildMinhashPairs]] (the two
    * frames share one lineage so they can never drift). Edge volume is
    * LINEAR in corpus size where the all-pairs expansion is quadratic
    * in exact-group size — the 30x scale probe measured a ~2,000-member
    * null-text group turning the expanded set into 2.18M pairs; the
    * star frame carries ~2,000 edges for the same group with PROVABLY
    * identical connected components (a star connects the clique, cross
    * edges connect canonicals, and component labels are min member ids
    * either way).
    */
  private def starEdges(s: SparkSession, dir: String): DataFrame = {
    minhashPairs(s, dir) // forces the build that registers the star tag
    graft.CacheRegistry.get("dedup_cc_star", s, dir).getOrElse(
      sys.error("dedup_cc_star must be registered by buildMinhashPairs"))
  }

  /** memoized connected-component labels over the near-dup pair graph —
    * the single lineage dedup_cc_clusters / dedup_cc_canonical /
    * dedup_savings_report all consume (one definition so they can
    * never drift). CC consumes the LINEAR star-edge frame, not the
    * quadratic all-pairs expansion — identical components, scale-safe
    * input (see [[starEdges]]).
    */
  private def ccLabels(s: SparkSession, dir: String): DataFrame =
    graft.CacheRegistry.memo("dedup_cc_labels", s, dir)(
      graft.operators.ConnectedComponents.run(
        starEdges(s, dir).select(col("a_id"), col("b_id"))))

  /** Materialize the shared memoized lineages (minhash signature/pair
    * persist + CC label rounds) outside any single query's timer. Bench
    * calls this in its warm phase and reports the time separately:
    * whichever dedup query alphabetically touches the memo first
    * otherwise absorbs the whole family's build (BENCH_r05 charged
    * +7 s of it to dedup_cc_canonical), making per-query numbers
    * incomparable across rounds. Verify does NOT call it — correctness
    * runs build lineage inside the query like any cold consumer.
    */
  def warmShared(s: SparkSession, dir: String): Unit = {
    ccLabels(s, dir).write.format("noop").mode("overwrite").save()
    // the expanded pair set itself: ccLabels materializes the shared
    // signature/star lineage but NOT the final union+sort pair frame,
    // so its first consumer (alphabetically dedup_cc_bcubed in Bench)
    // was still paying that one materialization (~1.5 s at sf0.1 —
    // found by the round-9 in-bench stage profile)
    minhashPairs(s, dir).write.format("noop").mode("overwrite").save()
    winnowSel(s, dir).write.format("noop").mode("overwrite").save()
    // the pair set over that selection — consumed by both
    // dedup_winnow_shared_pairs and dedup_pair_rouge_overlap
    winnowPairs(s, dir).write.format("noop").mode("overwrite").save()
    // the eval-block ground truth — consumed by dedup_minhash_recall,
    // dedup_winnow_recall and dedup_cc_bcubed
    exactTruthPairs(s, dir).write.format("noop").mode("overwrite").save()
    // the AllPairs gram index (df-ordered arrays + suffix-filter
    // signatures) — the offline artifact a production set-similarity
    // pipeline stages before serving pair queries, the servedCodes
    // convention: its one-time build is shared-warm cost, the join
    // itself is the query's
    prefixSorted(s, dir).write.format("noop").mode("overwrite").save()
    // the verified J >= 0.5 pair set above that index — consumed by
    // dedup_prefix_jaccard and dedup_nearest_dup; staging it here
    // leaves both queries measuring their own output-sized serving
    // step, not the shared candidate join
    prefixJaccardPairs(s, dir).write.format("noop").mode("overwrite").save()
    // the two span frames (r13): window-quantized spans feed FOUR
    // consumers (dedup_substring_spans, dedup_span_savings,
    // dedup_span_savings_by_source, dedup_spans_applied), token-exact
    // spans feed two (dedup_doc_token_spans, dedup_token_spans_applied)
    // — the same staged-offline-artifact convention as the pair sets
    // above; un-warmed, the alphabetically-first consumer absorbed the
    // whole build (~2.4 s at sf0.1) and per-query numbers drifted with
    // bench order
    substringSpans(s, dir).write.format("noop").mode("overwrite").save()
    docTokenSpans(s, dir).write.format("noop").mode("overwrite").save()
    ()
  }

  /** bucket ids -> ordered (a, b) pairs, shared by the band-candidate
    * and exact-dup-group expansions
    */
  private val pairExpansion =
    """flatten(transform(ids, (a, i) ->
      |  transform(slice(ids, i + 2, size(ids)), b -> struct(a, b))))"""
      .stripMargin

  /** one row per (canonical doc, band): the banded signature frame —
    * the exact-dup pre-pass (canon_id = lowest doc_id per fingerprint,
    * one window shuffle) keeps duplicate-heavy corpora from
    * concentrating a band bucket; single source of truth for
    * [[buildMinhashPairs]]' candidate stage and the
    * dedup_lsh_bucket_cost diagnostic, so the cost model can never
    * drift from the join it prices
    */
  private def bandsFrame(s: SparkSession, dir: String): DataFrame = {
    import graft.CacheRegistry.track
    // ONE pass over the corpus: tokenize once, emit the exact-dup
    // fingerprint AND the fused shingle+minhash signature side by side
    // (the kernel builds shingles in place — no per-doc shingle arrays
    // materialize). The persisted frame is 18 small values per doc, not
    // token arrays; at 100 TB this is the signature store a real
    // pipeline stages to disk. coalesce mirrors the oracle: a
    // NULL-token doc fingerprints like an empty-token doc.
    val sig = track(s, toksSpread(s, dir)
      .withColumn("fp", md5(coalesce(array_join(col("tok"), " "), lit(""))))
      .withColumn("mh", graft.functions.MinHashShingleSig.column(col("tok")))
      .select("doc_id", "fp", "mh"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    sig.withColumn("canon_id", min(col("doc_id")).over(w))
  }

  private def buildMinhashPairs(s: SparkSession, dir: String): DataFrame = {
    import graft.CacheRegistry.track
    val withCanon = bandsFrame(s, dir)
    // one row per (canonical doc, band) — candidates come from grouping
    // the band key and exploding pairs out of the collected bucket,
    // keeping the candidate stage to one pass over the signature lineage
    // instead of a self-join of it; buckets past MaxBucket are dropped.
    // cand is persisted: the verify prune below consumes it three times
    val bands = withCanon.filter(col("doc_id") === col("canon_id"))
      .select(col("doc_id") +: (0 until NumHashes).map(minhash): _*)
      .select(col("doc_id"),
        posexplode(array((0 until Bands).map(bandKey): _*))
          .as(Seq("band", "bk")))
    val cand = track(s, bands.groupBy("band", "bk")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= MaxBucket)
      .select(explode(expr(pairExpansion)).as("p"))
      .select(col("p.a").as("a_id"), col("p.b").as("b_id"))
      .distinct())
    // exact-Jaccard verify sets are built ONLY for candidate docs — the
    // broadcast semi-join prunes the scan to the bounded candidate id
    // set BEFORE any tokenize/shingle/array_distinct work runs
    val candIds = cand.select(col("a_id").as("doc_id"))
      .unionByName(cand.select(col("b_id").as("doc_id"))).distinct()
    // persisted: the sa and sb joins below each consume this frame, and
    // without the persist the scan+semi-join+tokenize+shingle lineage
    // runs once per side (measured ~1 s of the pair build's cold cost)
    val sets = track(s, shingleSets(toksFor(s, dir, candIds)))
    val canonPairs = cand
      .join(sets.select(col("doc_id").as("a_id"), col("st").as("sa")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("st").as("sb")), "b_id")
      .withColumn("inter", // inputs are distinct arrays => hash-based
        size(array_intersect(col("sa"), col("sb"))))  // O(n+m), not O(n*m)
      .withColumn("jaccard",
        col("inter").cast("double") /
          greatest(size(col("sa")) + size(col("sb")) - col("inter"), lit(1)))
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), col("jaccard"))
    // expand back to ALL doc pairs (output contract unchanged):
    // (1) within an exact-dup group every pair is a dup at jaccard 1.0 —
    //     a plain self-join on fp over the small persisted frame:
    //     UNLIKE the band buckets (bounded by MaxBucket), exact-dup
    //     groups are unbounded, so a collect_list explosion would
    //     materialize a whole hot group's id array in ONE task; the
    //     self-join keeps the quadratic OUTPUT but distributes the work,
    //     and AQE splits any skewed fp partition;
    // (2) a near-dup canonical pair expands to every cross pair of the
    //     two groups (identical content => identical jaccard).
    val within = withCanon.select(col("fp"), col("doc_id").as("a_id"))
      .join(withCanon.select(col("fp"), col("doc_id").as("b_id")), "fp")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(1.0).as("jaccard"))
    val members = withCanon.select(col("doc_id"), col("canon_id"))
    val cross = canonPairs
      .join(members.select(col("canon_id").as("a_id"), col("doc_id").as("ma")), "a_id")
      .join(members.select(col("canon_id").as("b_id"), col("doc_id").as("mb")), "b_id")
      .select(least(col("ma"), col("mb")).as("a_id"),
        greatest(col("ma"), col("mb")).as("b_id"), col("jaccard"))
    // register the LINEAR star-edge twin of the graph for CC (see
    // starEdges): canonical→member inside exact groups + the bounded
    // canonical near-dup pairs. Persisted — label propagation reads it
    // once per round.
    graft.CacheRegistry.memo("dedup_cc_star", s, dir)(
      track(s, withCanon.filter(col("doc_id") =!= col("canon_id"))
        .select(col("canon_id").as("a_id"), col("doc_id").as("b_id"))
        .unionByName(canonPairs.select("a_id", "b_id"))))
    // persist the bounded final pair set: dedup_minhash_survivors (and
    // any later consumer) reuses materialized rows instead of re-running
    // the banding lineage under its own write action
    track(s, within.unionByName(cross)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("a_id", "b_id"))
  }

  // ---- DuckDB twin ---------------------------------------------------

  private def duckHexToLong(e: String): String = (1 to 12).map(k =>
    s"(strpos('0123456789abcdef', substr($e, $k, 1)) - 1) * ${1L << (4 * (12 - k))}")
    .mkString("(", " + ", ")")

  /** shared CTE chain through the banded signature frame (`bands`) —
    * the SQL twin of [[bandsFrame]] + the per-band key derivation;
    * consumed by [[minhashSql]] and the dedup_lsh_bucket_cost oracle
    */
  private def minhashBandsCte: String = {
    val hashes = (0 until NumHashes).map(i =>
      s"list_aggregate(list_transform(sv, v -> (v * ${aCoef(i)} + ${bCoef(i)}) % $P), 'min') AS h$i")
      .mkString(",\n    ")
    val bandSelects = (0 until Bands).map { b =>
      val parts = (0 until RowsPerBand)
        .map(r => s"h${b * RowsPerBand + r}").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($parts) AS bk FROM mh"
    }.mkString("\n  UNION ALL\n  ")
    s"""cleaned AS (
       |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
       |), toksrc AS (
       |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
       |), fpr AS (
       |  SELECT doc_id, md5(coalesce(array_to_string(tok, ' '), '')) AS fp
       |  FROM toksrc
       |), canon AS (
       |  SELECT fp, min(doc_id) AS canon_id FROM fpr GROUP BY fp
       |), members AS (
       |  SELECT f.doc_id, c.canon_id FROM fpr f JOIN canon c USING (fp)
       |), shingled AS (
       |  SELECT t.doc_id,
       |    $shingleSqlExpr AS sh
       |  FROM toksrc t JOIN canon c ON t.doc_id = c.canon_id
       |), sval AS (
       |  SELECT doc_id, sh,
       |    list_transform(sh, s -> ${duckHexToLong("substr(md5(s), 1, 12)")} % $P) AS sv
       |  FROM shingled
       |), mh AS (
       |  SELECT doc_id,
       |    $hashes
       |  FROM sval
       |), bands AS (
       |  $bandSelects
       |)""".stripMargin
  }

  /** shared CC oracle chain (pairs -> undirected edges -> recursive
    * reachability -> (doc_id, cluster_id)); callers prepend
    * `WITH RECURSIVE` — consumed by dedup_savings_report and
    * dedup_removed_by_source so the per-source decomposition can never
    * disagree with the corpus totals
    */
  private def ccCompCte: String =
    s"""pairs AS (
       |  $minhashSql
       |), edges AS (
       |  SELECT a_id AS u, b_id AS v FROM pairs
       |  UNION
       |  SELECT b_id, a_id FROM pairs
       |), nodes AS (
       |  SELECT DISTINCT u AS id FROM edges
       |), reach(id, lab) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.id
       |), comp AS (
       |  SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id
       |)""".stripMargin

  private def minhashSql: String = {
    s"""WITH $minhashBandsCte, bsz AS (
       |  SELECT band, bk, count(*) AS n FROM bands GROUP BY 1, 2
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
       |  JOIN bsz z ON z.band = a.band AND z.bk = a.bk
       |  WHERE z.n <= $MaxBucket
       |), sets AS (
       |  SELECT doc_id, list_distinct(sh) AS st FROM shingled
       |), j AS (
       |  SELECT c.a_id, c.b_id,
       |    len(list_filter(sa.st, x -> list_contains(sb.st, x))) AS inter,
       |    len(sa.st) AS la, len(sb.st) AS lb
       |  FROM cand c
       |  JOIN sets sa ON sa.doc_id = c.a_id
       |  JOIN sets sb ON sb.doc_id = c.b_id
       |), canon_pairs AS (
       |  SELECT a_id, b_id,
       |    CAST(inter AS DOUBLE) / greatest(la + lb - inter, 1) AS jaccard
       |  FROM j
       |  WHERE CAST(inter AS DOUBLE) / greatest(la + lb - inter, 1) >= 0.5
       |), within AS (
       |  SELECT f1.doc_id AS a_id, f2.doc_id AS b_id, CAST(1.0 AS DOUBLE) AS jaccard
       |  FROM fpr f1 JOIN fpr f2 ON f1.fp = f2.fp AND f1.doc_id < f2.doc_id
       |), cross_exp AS (
       |  SELECT least(ma.doc_id, mb.doc_id) AS a_id,
       |    greatest(ma.doc_id, mb.doc_id) AS b_id, p.jaccard
       |  FROM canon_pairs p
       |  JOIN members ma ON ma.canon_id = p.a_id
       |  JOIN members mb ON mb.canon_id = p.b_id
       |)
       |SELECT a_id, b_id, round(jaccard, 6) AS jaccard
       |FROM (SELECT * FROM within UNION ALL SELECT * FROM cross_exp)
       |ORDER BY a_id, b_id""".stripMargin
  }

  // ---- SimHash -------------------------------------------------------

  /** 64-bit SimHash over the token multiset, computed as a pure per-row
    * array fold — no explode, no shuffle. Token hash = all 32 hex chars
    * of md5 would overflow signed-64 arithmetic in the oracle, so each
    * token carries TWO portable 32-bit values (md5 chars 1-8 and 9-16);
    * fingerprint bits 0-31 come from the low half, 32-63 from the high
    * half. Per-bit ±1 sums via aggregate() over the value arrays, sign
    * => fingerprint bit. The bit-63 weight is Long.MinValue and is added
    * LAST so every partial sum stays within signed-64 range on both
    * engines (bits 0..62 sum to at most 2^63-1 exactly; DuckDB checks
    * bigint overflow, Spark under ANSI does too).
    *
    * 64 bits (vs a narrower fingerprint) is what makes the banding below
    * scale: 4 bands x 16 bits = 65536 keys per band, so candidate volume
    * is ~n²/65536 per band instead of n²/256 — the difference between a
    * workable 100 TB pre-filter and a quadratic blowup.
    */
  // single source of truth shared with the STREAMING near-dup twin
  // (NewsStream.dedupNearSimhashWithinWatermark) — see SimHashBands
  private val SimBits = graft.functions.SimHashBands.Bits
  private val SimBands = graft.functions.SimHashBands.Bands
  private val SimBandBits = graft.functions.SimHashBands.BandBits
  private val SimBandMask = graft.functions.SimHashBands.BandMask
  /** pigeonhole: <= SimBands-1 differing bits => some band identical */
  private val MaxHamming = graft.functions.SimHashBands.MaxHamming

  /** max entries per (band, key) bucket in the simhash pair join — see
    * the dedup_simhash_pairs comment
    */
  val SimMaxBucket = 256

  // ---- shared split + decontamination lineage ------------------------
  // one definition each for the md5-bucket split, the 8-token shingle
  // digests, and their oracle CTE chain: the exact and Bloom
  // decontamination paths MUST stay in lockstep (same split, same
  // shingle width), so neither may carry a private copy

  /** deterministic 80/10/10 split on the md5 of the stable doc key */
  private[queries] def splitCol: Column = {
    val bucket =
      expr("conv(substring(md5(cast(doc_id AS string)), 1, 4), 16, 10)")
        .cast("long") % 100
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
  }

  private[queries] val splitCaseSql: String =
    """CASE
      |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 80 THEN 'train'
      |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 90 THEN 'val'
      |    ELSE 'test' END""".stripMargin

  /** 8-token shingles as md5 digests; short docs fall back to the
    * whole-text digest (8 is in the usual 8–13 decontamination range)
    */
  private[queries] def sh8Col: Column =
    when(size(col("tok")) >= 8,
      transform(sequence(lit(1), size(col("tok")) - 7), i =>
        md5(concat_ws(" ",
          (0 until 8).map(o => element_at(col("tok"), i + o)): _*))))
      .otherwise(array(md5(coalesce(array_join(col("tok"), " "), lit("")))))

  /** DuckDB twin of [[sh8Col]] (single expression, usable inline) */
  private[queries] def sh8Sql(tok: String): String =
    s"CASE WHEN len($tok) >= 8 THEN list_transform(range(1, len($tok) - 6)," +
      s" i -> md5(array_to_string($tok[i:i+7], ' ')))" +
      s" ELSE [md5(coalesce(array_to_string($tok, ' '), ''))] END"

  /** oracle chain shared by both decontamination queries: cleaned ->
    * toksrc -> split -> sh (8-token digests) -> ex (distinct test
    * digests) / tru (train doc digests) / hit (contaminated train docs)
    */
  private def decontamCte: String =
    s"""WITH cleaned AS (
       |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
       |), toksrc AS (
       |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
       |), split AS (
       |  SELECT doc_id, tok, $splitCaseSql AS split
       |  FROM toksrc
       |), sh AS (
       |  SELECT doc_id, split, ${sh8Sql("tok")} AS shl
       |  FROM split
       |), ex AS (
       |  SELECT DISTINCT unnest(shl) AS g FROM sh WHERE split = 'test'
       |), tru AS (
       |  SELECT doc_id, unnest(shl) AS g FROM sh WHERE split = 'train'
       |), hit AS (
       |  SELECT DISTINCT t.doc_id FROM tru t JOIN ex e USING (g)
       |)""".stripMargin

  /** 8 hex chars -> 32-bit value (max 2^32-1, overflow-safe in a long;
    * multipliers are bigint literals so int32 math never overflows) */
  private def duckHex8(x: String): String = (1 to 8).map(k =>
    s"(strpos('0123456789abcdef', substr($x, $k, 1)) - 1) * CAST(${1L << (4 * (8 - k))} AS BIGINT)")
    .mkString("(", " + ", ")")

  /** additive weight of fingerprint bit b; bit 63 is the sign bit */
  private def bitWeight(b: Int): Long = 1L << b // wraps to MinValue at 63

  /** Fingerprints come from the native codegen'd kernel
    * (graft.functions.SimHash64): one md5 per token, per-bit ±1 sums in
    * a tight JVM loop, digest bytes 0-3/4-7 = the oracle's hex chars
    * 1-8/9-16. The kernel pins empty/null token arrays to 0, matching
    * the oracle's list_sum([]) IS NULL -> 0 convention.
    *
    * Memoized + persisted per (session, dir): the fingerprint table is
    * the PRODUCE side (dedup_simhash dumps it) and the pair query is
    * its consumer — the same disclosed sharing as the minhash lineage;
    * whichever runs first pays the scan+tokenize+kernel pass. Two longs
    * per doc, released via CacheRegistry.clear.
    */
  private def simhashes(s: SparkSession, dir: String): DataFrame =
    graft.CacheRegistry.memo("dedup_simhash_fps", s, dir)(
      graft.CacheRegistry.track(s,
        toksSpread(s, dir).select(col("doc_id"),
          graft.functions.SimHash64.column(col("tok")).as("simhash"))))

  /** dedup_prefix_jaccard's per-doc index frame: the global-df-ordered
    * (rarest-first) gram array `sg`, its size `n`, and the 256-bucket
    * suffix-filter count signature `sig` ([[graft.functions.GramCountSig]]).
    * Memoized + persisted per (session, dir) — the simhashes/minhash-
    * pairs precedent: every consumer of the AllPairs join (the two
    * prefix sides, the hash-prescreen arrays, the exact-verify arrays)
    * derives from THIS one frame, so the scan+tokenize+df-sort pass
    * runs once per corpus, not once per consumer. (Before the memo,
    * Catalyst pushed the tokenize projection below the round-robin
    * repartition and each of the three consumers re-ran it on the
    * single file split — 3 x 2 s single-threaded at sf0.1, with zero
    * exchange reuse.) Cost: one row per doc (gram array ~ doc size —
    * the same size class as the cached minhash signature table),
    * released via CacheRegistry.clear.
    *
    * Per-doc gram list sorted by the global (df, gram) order; the
    * struct sort gives rarest-first, the only order under which the
    * prefix bound holds. (A doc_id-partitioned row_number window was
    * tried instead of collect_list + array_sort + slice + posexplode
    * and measured 2 s SLOWER at sf0.1 — the per-doc in-memory struct
    * sorts beat one big Tungsten (doc_id, df, gram) row sort here.)
    * dfreq is the gram DICTIONARY — Heaps-law corpus-sized at 100 TB,
    * so it shuffles like every other corpus-sized side.
    */
  private def prefixSorted(s: SparkSession, dir: String): DataFrame =
    graft.CacheRegistry.memo("dedup_prefix_sorted", s, dir)(
      graft.CacheRegistry.track(s, {
        val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
        // tokenize above the persisted spread (Tables.spread): the
        // documents scan is one unsplittable task at test scale, and a
        // bare repartition can't fix it — Catalyst pushes deterministic
        // Projects through Repartition (normally a win — fewer
        // exchanged bytes), sinking the tokenize below the exchange
        // back to scan width; the 10x probe measured the whole
        // tokenize running in 3 scan-split tasks (16 s/task), twice,
        // inside this build. A persisted exchange is a boundary no
        // projection crosses.
        val grams = bigramSets(toksSpread(s, dir))
        val posting = grams.select(col("doc_id"),
          explode(col("g")).as("gram"))
        val dfreq = posting.groupBy("gram").agg(count(lit(1)).as("df"))
        posting.join(dfreq.hint("shuffle_hash"), "gram")
          .repartition(nPart, col("doc_id"))
          .groupBy("doc_id")
          .agg(transform(
            array_sort(collect_list(struct(col("df"), col("gram")))),
            x => x.getField("gram")).as("sg"))
          .withColumn("n", size(col("sg")))
          // SUFFIX-FILTER signature (PPJoin+ adapted for a distributed
          // join, Xiao et al. WWW'08 §4): a 256-bucket count sketch of
          // the doc's gram set. The pair join bounds the overlap by the
          // histogram intersection Σ min(cA,cB) — which can only
          // OVERcount the true overlap, so cutting bound < alpha loses
          // no pair (PrefixJaccardSpec brute-force-checks completeness
          // through this filter). This is what the positional bound
          // cannot do on the dense synthetic vocabulary: positions say
          // "everything after (i,j) COULD match"; the sketch measures
          // how much actually CAN. Trade: +256 B per prefix row in the
          // gram-join exchange (linear in corpus) buys pruning of the
          // candidate stream (superlinear in vocabulary density) —
          // sf0.1 measured 9.0M candidate rows -> 4.4k before the
          // distinct/prescreen exchanges (256 true pairs).
          .withColumn("sig",
            graft.functions.GramCountSig.column(col("sg")))
      }))

  private val simhashCte: String = {
    val fp = (0 until SimBits).map { b =>
      val (arr, sh) = if (b < 32) ("tvl", b) else ("tvh", b - 32)
      val w = if (b == 63) "(-9223372036854775807 - 1)" else bitWeight(b).toString
      s"(CASE WHEN list_sum(list_transform($arr, v -> ((v >> $sh) & 1) * 2 - 1)) >= 0 THEN $w ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH cleaned AS (
       |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
       |), toksrc AS (
       |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
       |), tvals AS (
       |  SELECT doc_id, tok,
       |    list_transform(tok, t -> ${duckHex8("substr(md5(t), 1, 8)")}) AS tvl,
       |    list_transform(tok, t -> ${duckHex8("substr(md5(t), 9, 8)")}) AS tvh
       |  FROM toksrc
       |), fp AS (
       |  SELECT doc_id,
       |    CASE WHEN len(tok) > 0 THEN $fp ELSE 0 END AS simhash
       |  FROM tvals
       |)""".stripMargin
  }

  // ---- queries -------------------------------------------------------

  val qs: Seq[Q] = Seq(
    // Exact dedup stats: corpus size vs distinct normalized content
    Q(
      "dedup_exact_stats",
      (s, d) =>
        toks(s, d)
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(md5(coalesce(array_join(col("tok"), " "), lit(""))))
              .as("n_unique")),
      Some(
        s"""WITH cleaned AS (
           |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
           |), toksrc AS (
           |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
           |)
           |SELECT count(*) AS n_docs,
           |  count(DISTINCT md5(coalesce(array_to_string(tok, ' '), ''))) AS n_unique
           |FROM toksrc""".stripMargin)),

    // MinHash + LSH banding near-dup pairs, exact-Jaccard verified
    Q("dedup_minhash_pairs", (s, d) => minhashPairs(s, d), Some(minhashSql)),

    // LSH BUCKET COST MODEL — the per-band price sheet of the banded
    // candidate join: Σ C(n,2) over buckets IS exactly the pair volume
    // the join emits per band (the number Bands/RowsPerBand are tuned
    // against), max_bucket is the skew hotspot a boilerplate-heavy
    // corpus concentrates, and the dropped_* columns meter the
    // MaxBucket discriminating-power guard. Shares [[bandsFrame]] with
    // the candidate join itself, so the model can never drift from the
    // join it prices. Two partial-agg'd reductions: (band, bk) counts
    // then a |Bands|-row rollup — all integer, corpus scanned once.
    Q(
      "dedup_lsh_bucket_cost",
      (s, d) => {
        val withCanon = bandsFrame(s, d)
        val bands = withCanon.filter(col("doc_id") === col("canon_id"))
          .select(col("doc_id") +: (0 until NumHashes).map(minhash): _*)
          .select(col("doc_id"),
            posexplode(array((0 until Bands).map(bandKey): _*))
              .as(Seq("band", "bk")))
        val pairsOf = expr("(n * (n - 1)) div 2")
        val kept = col("n") > 1 && col("n") <= MaxBucket
        bands.groupBy("band", "bk").agg(count(lit(1)).as("n"))
          .groupBy("band")
          .agg(
            sum(when(col("n") === 1, 1L).otherwise(0L)).cast("long")
              .as("n_singletons"),
            sum(when(kept, 1L).otherwise(0L)).cast("long")
              .as("n_buckets"),
            coalesce(max(col("n")), lit(0L)).cast("long")
              .as("max_bucket"),
            sum(when(kept, pairsOf).otherwise(0L)).cast("long")
              .as("n_candidate_pairs"),
            sum(when(col("n") > MaxBucket, 1L).otherwise(0L))
              .cast("long").as("n_dropped_buckets"),
            sum(when(col("n") > MaxBucket, pairsOf).otherwise(0L))
              .cast("long").as("n_dropped_pairs"))
          .orderBy("band")
      },
      Some(
        s"""WITH $minhashBandsCte, bsz AS (
           |  SELECT band, bk, count(*) AS n FROM bands GROUP BY 1, 2
           |)
           |SELECT CAST(band AS INT) AS band,
           |  CAST(coalesce(sum(CASE WHEN n = 1 THEN 1 END), 0)
           |    AS BIGINT) AS n_singletons,
           |  CAST(coalesce(sum(CASE WHEN n > 1 AND n <= $MaxBucket
           |    THEN 1 END), 0) AS BIGINT) AS n_buckets,
           |  CAST(coalesce(max(n), 0) AS BIGINT) AS max_bucket,
           |  CAST(coalesce(sum(CASE WHEN n > 1 AND n <= $MaxBucket
           |    THEN (n * (n - 1)) // 2 END), 0) AS BIGINT)
           |    AS n_candidate_pairs,
           |  CAST(coalesce(sum(CASE WHEN n > $MaxBucket THEN 1 END), 0)
           |    AS BIGINT) AS n_dropped_buckets,
           |  CAST(coalesce(sum(CASE WHEN n > $MaxBucket
           |    THEN (n * (n - 1)) // 2 END), 0) AS BIGINT)
           |    AS n_dropped_pairs
           |FROM bsz GROUP BY band ORDER BY band""".stripMargin)),

    // The dedup RESOLUTION step: corpus size, detected dupes (pair
    // b-sides), and the surviving document count after keep-lowest-id
    Q(
      "dedup_minhash_survivors",
      (s, d) => {
        val dupes = minhashPairs(s, d)
          .agg(countDistinct(col("b_id")).as("n_dupes"))
        toks(s, d).agg(count(lit(1)).as("n_docs"))
          .crossJoin(dupes)
          .withColumn("n_survivors", col("n_docs") - col("n_dupes"))
      },
      Some(
        s"""SELECT n_docs, n_dupes, n_docs - n_dupes AS n_survivors
           |FROM (SELECT count(*) AS n_docs FROM documents)
           |CROSS JOIN (SELECT count(DISTINCT b_id) AS n_dupes
           |            FROM ($minhashSql))""".stripMargin)),

    // Duplicate CLUSTERS: connected components over the near-dup pair
    // graph (pairs only relate docs two at a time; transitive closure is
    // what a dedup resolution actually keeps/drops — e.g. A~B, B~C must
    // collapse to ONE cluster even when A,C never paired). Spark side is
    // the O(log n)-round label-propagation + pointer-jumping operator
    // (graft.operators.ConnectedComponents) over the persisted pair set;
    // the oracle replays it as a recursive min-label closure in DuckDB.
    Q(
      "dedup_cc_clusters",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id")
        ccLabels(s, d)
          .select(col("id").as("doc_id"), col("cluster_id"))
          .withColumn("n_members", count(lit(1)).over(w))
          .orderBy("doc_id")
      },
      Some(
        s"""WITH RECURSIVE pairs AS (
           |  $minhashSql
           |), edges AS (
           |  SELECT a_id AS u, b_id AS v FROM pairs
           |  UNION
           |  SELECT b_id, a_id FROM pairs
           |), nodes AS (
           |  SELECT DISTINCT u AS id FROM edges
           |), reach(id, lab) AS (
           |  SELECT id, id FROM nodes
           |  UNION
           |  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.id
           |), comp AS (
           |  SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id
           |)
           |SELECT doc_id, cluster_id,
           |  count(*) OVER (PARTITION BY cluster_id) AS n_members
           |FROM comp ORDER BY doc_id""".stripMargin)),

    // SimHash fingerprints (portable bit arithmetic, oracle-checked)
    Q(
      "dedup_simhash",
      (s, d) => simhashes(s, d).orderBy("doc_id"),
      Some(s"$simhashCte SELECT doc_id, simhash FROM fp ORDER BY doc_id")),

    // SimHash near-pairs: hamming <= 3 over the 64-bit fingerprints.
    // EXACT but banded: 64 bits split into 4 x 16-bit bands — two
    // fingerprints within hamming 3 must agree on at least one band
    // (pigeonhole), so candidates come from an equality join on
    // (band, key) with 65536 keys per band, never an O(n²) cross join.
    // Same banding in the oracle. (Arithmetic >> sign-extends the
    // negative half of the fingerprint space on both engines, but the
    // & mask makes band extraction shift-type-agnostic.)
    //
    // SimMaxBucket guards the self-join the same way MaxBucket guards
    // the minhash banding: a band bucket holding > cap entries means
    // thousands of documents share 16 fingerprint bits — on organic
    // corpora that never happens (65536 keys/band), but a corpus whose
    // token multisets are dominated by a few shared high-count tokens
    // collapses fingerprints together and the uncapped join goes
    // quadratic (found by the 10x scale probe, whose first salting
    // scheme did exactly that). Inside an oversized bucket the PAIR
    // OUTPUT itself would be quadratic, so no banding scheme saves it —
    // dropping the bucket (mirrored in the oracle) is the standard
    // trade. Recall caveat: the first-match dedup below tests raw
    // fingerprint bands, not bucket survival, so a pair whose FIRST
    // matching band is capped is dropped even if a later matching band
    // survives — capping trades exactly that recall for boundedness,
    // identically on both engines.
    Q(
      "dedup_simhash_pairs",
      (s, d) => {
        def bandOf(c: Column, b: Int): Column =
          shiftright(c, SimBandBits * b).bitwiseAND(lit(SimBandMask))
        val f = simhashes(s, d)
        // bucket-size window shares the (band, key) partitioning the
        // self-join needs — no extra exchange
        val wsz = org.apache.spark.sql.expressions.Window
          .partitionBy("band", "key")
        val bands = f.select(col("doc_id"), col("simhash"),
          posexplode(array((0 until SimBands).map(b =>
            bandOf(col("simhash"), b)): _*))
            .as(Seq("band", "key")))
          .withColumn("bsz", count(lit(1)).over(wsz))
          .filter(col("bsz") <= SimMaxBucket)
          .drop("bsz")
        val a = bands.select(col("band"), col("key"),
          col("doc_id").as("a_id"), col("simhash").as("fa"))
        val b = bands.select(col("band"), col("key"),
          col("doc_id").as("b_id"), col("simhash").as("fb"))
        // dedup across bands WITHOUT a distinct: keep a pair only in its
        // FIRST matching band (all earlier bands must differ)
        val firstMatch = (0 until SimBands).map { i =>
          (0 until i).map(j => bandOf(col("fa"), j) =!= bandOf(col("fb"), j))
            .foldLeft(col("band") === i)(_ && _)
        }.reduce(_ || _)
        a.join(b, Seq("band", "key"))
          .filter(col("a_id") < col("b_id") && firstMatch)
          .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
          .filter(col("hamming") <= MaxHamming)
          .select("a_id", "b_id", "hamming")
          .orderBy("a_id", "b_id")
      },
      Some {
        val bandsSql = (0 until SimBands).map(b =>
          s"SELECT doc_id, simhash, $b AS band, (simhash >> ${SimBandBits * b}) & $SimBandMask AS key FROM fp")
          .mkString("\n  UNION ALL\n  ")
        val firstMatchSql = (0 until SimBands).map { i =>
          val earlier = (0 until i).map(j =>
            s"((a.simhash >> ${SimBandBits * j}) & $SimBandMask) <> ((b.simhash >> ${SimBandBits * j}) & $SimBandMask)")
          (s"a.band = $i" +: earlier).mkString("(", " AND ", ")")
        }.mkString("(", "\n    OR ", ")")
        s"""$simhashCte, bands0 AS (
           |  $bandsSql
           |), bsz AS (
           |  SELECT band, key, count(*) AS n FROM bands0 GROUP BY 1, 2
           |), bands AS (
           |  SELECT b0.* FROM bands0 b0
           |  JOIN bsz z ON z.band = b0.band AND z.key = b0.key
           |  WHERE z.n <= $SimMaxBucket
           |)
           |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           |  bit_count(xor(a.simhash, b.simhash)) AS hamming
           |FROM bands a JOIN bands b
           |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.simhash, b.simhash)) <= $MaxHamming
           |  AND $firstMatchSql
           |ORDER BY a_id, b_id""".stripMargin
      }),

    // SimHash THRESHOLD-TUNING histogram: the hamming-distance
    // distribution over ALL banded candidate pairs (no MaxHamming cut)
    // — the curve that justifies MaxHamming = 3: a real corpus shows a
    // bimodal split (near-dups pile at 0-3, unrelated banded collisions
    // spread high), and this is the evidence an index team reads before
    // moving the threshold. Same banding + first-match dedup +
    // SimMaxBucket guard as dedup_simhash_pairs, so the histogram
    // describes exactly the candidate set that query mines; output is
    // <= 65 rows (one per hamming value present). is_dup marks the
    // shipped operating point.
    Q(
      "dedup_simhash_hamming_hist",
      (s, d) => {
        def bandOf(c: Column, b: Int): Column =
          shiftright(c, SimBandBits * b).bitwiseAND(lit(SimBandMask))
        val f = simhashes(s, d)
        val wsz = org.apache.spark.sql.expressions.Window
          .partitionBy("band", "key")
        val bands = f.select(col("doc_id"), col("simhash"),
          posexplode(array((0 until SimBands).map(b =>
            bandOf(col("simhash"), b)): _*))
            .as(Seq("band", "key")))
          .withColumn("bsz", count(lit(1)).over(wsz))
          .filter(col("bsz") <= SimMaxBucket)
          .drop("bsz")
        val a = bands.select(col("band"), col("key"),
          col("doc_id").as("a_id"), col("simhash").as("fa"))
        val b = bands.select(col("band"), col("key"),
          col("doc_id").as("b_id"), col("simhash").as("fb"))
        val firstMatch = (0 until SimBands).map { i =>
          (0 until i).map(j => bandOf(col("fa"), j) =!= bandOf(col("fb"), j))
            .foldLeft(col("band") === i)(_ && _)
        }.reduce(_ || _)
        a.join(b, Seq("band", "key"))
          .filter(col("a_id") < col("b_id") && firstMatch)
          .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
          .groupBy("hamming")
          .agg(count(lit(1)).as("n_pairs"))
          .withColumn("is_dup", col("hamming") <= MaxHamming)
          .orderBy("hamming")
      },
      Some {
        val bandsSql = (0 until SimBands).map(b =>
          s"SELECT doc_id, simhash, $b AS band, (simhash >> ${SimBandBits * b}) & $SimBandMask AS key FROM fp")
          .mkString("\n  UNION ALL\n  ")
        val firstMatchSql = (0 until SimBands).map { i =>
          val earlier = (0 until i).map(j =>
            s"((a.simhash >> ${SimBandBits * j}) & $SimBandMask) <> ((b.simhash >> ${SimBandBits * j}) & $SimBandMask)")
          (s"a.band = $i" +: earlier).mkString("(", " AND ", ")")
        }.mkString("(", "\n    OR ", ")")
        s"""$simhashCte, bands0 AS (
           |  $bandsSql
           |), bsz AS (
           |  SELECT band, key, count(*) AS n FROM bands0 GROUP BY 1, 2
           |), bands AS (
           |  SELECT b0.* FROM bands0 b0
           |  JOIN bsz z ON z.band = b0.band AND z.key = b0.key
           |  WHERE z.n <= $SimMaxBucket
           |)
           |SELECT bit_count(xor(a.simhash, b.simhash)) AS hamming,
           |  count(*) AS n_pairs,
           |  bit_count(xor(a.simhash, b.simhash)) <= $MaxHamming AS is_dup
           |FROM bands a JOIN bands b
           |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
           |WHERE $firstMatchSql
           |GROUP BY 1 ORDER BY hamming""".stripMargin
      }),

    // INCREMENTAL dedup: a NEW batch of documents arrives (here: the
    // deterministic split's 'val' bucket plays the new crawl; 'train'
    // plays the existing corpus) and each new doc is checked for a
    // near-dup already in the corpus — the everyday shape of corpus
    // maintenance, where re-running the full pairwise dedup on
    // corpus+batch would redo work proportional to the CORPUS on every
    // batch. This form touches the corpus once to band its (persisted,
    // two-longs-per-doc) simhash fingerprints and joins only on
    // (band, key): cost scales with batch x bucket, not corpus². A
    // small daily batch would broadcast its banded side; the shuffle
    // join here is the general-size path. Corpus buckets over
    // SimMaxBucket are dropped exactly like the pair query (same
    // adversarial-collapse guard, mirrored in the oracle). Hamming 0
    // covers exact re-crawls; <= MaxHamming the re-syndications.
    Q(
      "dedup_incremental_batch",
      (s, d) => {
        def bandOf(c: Column, b: Int): Column =
          shiftright(c, SimBandBits * b).bitwiseAND(lit(SimBandMask))
        val f = simhashes(s, d).withColumn("split", splitCol)
        def banded(df: DataFrame): DataFrame =
          df.select(col("doc_id"), col("simhash"),
            posexplode(array((0 until SimBands).map(b =>
              bandOf(col("simhash"), b)): _*))
              .as(Seq("band", "key")))
        val wsz = org.apache.spark.sql.expressions.Window
          .partitionBy("band", "key")
        val corpus = banded(f.filter(col("split") === "train"))
          .withColumn("bsz", count(lit(1)).over(wsz))
          .filter(col("bsz") <= SimMaxBucket)
          .select(col("band"), col("key"),
            col("doc_id").as("c_id"), col("simhash").as("fc"))
        banded(f.filter(col("split") === "val"))
          .join(corpus, Seq("band", "key"))
          .withColumn("hamming", bit_count(col("simhash").bitwiseXOR(col("fc"))))
          .filter(col("hamming") <= MaxHamming)
          .groupBy(col("doc_id"))
          .agg(min(col("c_id")).as("dup_of"),
            min(col("hamming")).as("best_hamming"),
            countDistinct(col("c_id")).as("n_matches"))
          .orderBy("doc_id")
      },
      Some {
        def bandsSql(split: String): String = (0 until SimBands).map(b =>
          s"SELECT doc_id, simhash, $b AS band, (simhash >> ${SimBandBits * b}) & $SimBandMask AS key FROM sp WHERE split = '$split'")
          .mkString("\n  UNION ALL\n  ")
        s"""$simhashCte, sp AS (
           |  SELECT doc_id, simhash, $splitCaseSql AS split FROM fp
           |), cb0 AS (
           |  ${bandsSql("train")}
           |), csz AS (
           |  SELECT band, key, count(*) AS n FROM cb0 GROUP BY 1, 2
           |), cb AS (
           |  SELECT cb0.* FROM cb0 JOIN csz z
           |  ON z.band = cb0.band AND z.key = cb0.key
           |  WHERE z.n <= $SimMaxBucket
           |), nb AS (
           |  ${bandsSql("val")}
           |)
           |SELECT n.doc_id, min(c.doc_id) AS dup_of,
           |  min(bit_count(xor(n.simhash, c.simhash))) AS best_hamming,
           |  count(DISTINCT c.doc_id) AS n_matches
           |FROM nb n JOIN cb c ON n.band = c.band AND n.key = c.key
           |WHERE bit_count(xor(n.simhash, c.simhash)) <= $MaxHamming
           |GROUP BY n.doc_id ORDER BY n.doc_id""".stripMargin
      }),

    // Split-contamination check: how many distinct token bigrams of the
    // TEST split also occur in the TRAIN split (benchmark-contamination
    // detection, a standard training-data hygiene op). Splits are the
    // same deterministic md5 buckets as doc_hash_split_counts. Scale
    // shape: ONE scan, ONE shuffle — per-gram membership flags via a
    // grouped bool-or (partial-agg'd), no join and no distinct pass.
    Q(
      "dedup_split_contamination",
      (s, d) => {
        toks(s, d)
          .withColumn("split", splitCol)
          .select(col("split"), explode(when(size(col("tok")) >= 2,
            transform(sequence(lit(1), size(col("tok")) - 1), i =>
              concat_ws(" ", element_at(col("tok"), i),
                element_at(col("tok"), i + 1))))
            .otherwise(col("tok"))).as("g"))
          .groupBy("g")
          .agg(max(col("split") === "test").as("has_test"),
            max(col("split") === "train").as("has_train"))
          .filter(col("has_test"))
          .agg(count(lit(1)).as("n_test_grams"),
            count(when(col("has_train"), 1)).as("n_contaminated"))
      },
      Some(
        s"""WITH cleaned AS (
           |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
           |), toksrc AS (
           |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
           |), split AS (
           |  SELECT doc_id, tok, $splitCaseSql AS split
           |  FROM toksrc
           |), ex AS (
           |  SELECT split, unnest(CASE WHEN len(tok) >= 2
           |    THEN list_transform(range(1, len(tok)),
           |           i -> tok[i] || ' ' || tok[i+1])
           |    ELSE tok END) AS g
           |  FROM split
           |), flags AS (
           |  SELECT g, bool_or(split = 'test') AS has_test,
           |    bool_or(split = 'train') AS has_train
           |  FROM ex GROUP BY g
           |)
           |SELECT count(*) AS n_test_grams,
           |  count(CASE WHEN has_train THEN 1 END) AS n_contaminated
           |FROM flags WHERE has_test""".stripMargin)),

    // Benchmark DECONTAMINATION at document granularity: flag every
    // TRAIN-split document that shares an 8-token shingle with any
    // TEST-split document (the standard n-gram-overlap decontamination
    // of LLM training corpora; 8 tokens is in the usual 8–13 range).
    // Scale shape: the test/benchmark side is small by definition, so
    // its distinct shingle digests BROADCAST — the train corpus is
    // scanned once, its shingles checked map-side (left-semi against
    // the broadcast set), and only matching doc_ids reach the one
    // distinct-shuffle. Shingles travel as md5 digests, not strings.
    Q(
      "doc_decontaminate",
      (s, d) => {
        val base = toks(s, d).withColumn("split", splitCol)
        val testSh = base.filter(col("split") === "test")
          .select(explode(sh8Col).as("g")).distinct()
        val trainSh = base.filter(col("split") === "train")
          .select(col("doc_id"), explode(sh8Col).as("g"))
        val hit = trainSh
          .join(broadcast(testSh), Seq("g"), "left_semi")
          .select("doc_id").distinct()
          .withColumn("contaminated", lit(true))
        // the spine needs only ids — splitCol is md5(doc_id)-derived,
        // so this branch skips the tokenize pass `base` would pay (r13)
        Tables.t(s, d, "documents").select("doc_id")
          .withColumn("split", splitCol)
          .filter(col("split") === "train").select("doc_id")
          .join(hit, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("contaminated"), lit(false)).as("contaminated"))
          .orderBy("doc_id")
      },
      Some(
        s"""$decontamCte
           |SELECT s.doc_id, (h.doc_id IS NOT NULL) AS contaminated
           |FROM sh s LEFT JOIN hit h USING (doc_id)
           |WHERE s.split = 'train'
           |ORDER BY doc_id""".stripMargin)),

    // Bloom-filter decontamination — the sketch path for when even the
    // DIGEST set of the benchmark side outgrows a broadcast hash set
    // (a few GB of md5s): a bits-only Bloom filter over the test-split
    // shingle digests is built distributed (partial sketches OR-merged,
    // Spark's stat.bloomFilter), shipped to every executor, and the
    // train corpus probes it map-side — zero shuffle on the big side,
    // same shape as the exact variant above. The filter's bit pattern is
    // engine-specific, so the oracle-checkable contract is the Bloom
    // GUARANTEE, emitted as booleans: no false negatives (every exactly-
    // contaminated shingle occurrence is flagged), and the shingle-level
    // false-positive rate within 5x the configured fpp (+100 absolute
    // slack so tiny corpora don't flake a probabilistic bound).
    Q(
      "doc_decontaminate_bloom",
      (s, d) => {
        val fpp = 0.01
        val base = toks(s, d).withColumn("split", splitCol)
        // small by definition (benchmark-side digests) and consumed
        // THREE times (count, filter build, exact-hit join) — two of
        // them driver ACTIONS, so un-persisted it tokenized the test
        // split three times (r13, guide §5)
        val testSh = graft.CacheRegistry.track(s,
          base.filter(col("split") === "test")
            .select(explode(sh8Col).as("g")).distinct())
        val bloom = testSh.stat.bloomFilter(
          "g", math.max(testSh.count(), 1000L), fpp)
        val bf = s.sparkContext.broadcast(bloom)
        val mightContain =
          udf((g: String) => bf.value.mightContainString(g))
        val probes = base.filter(col("split") === "train")
          .select(col("doc_id"), explode(sh8Col).as("g"))
          .join(broadcast(testSh.withColumn("hit", lit(true))), Seq("g"), "left")
          .select(col("doc_id"),
            coalesce(col("hit"), lit(false)).as("exact"),
            mightContain(col("g")).as("bloom"))
        // gram-level stats fold into the per-doc aggregate as partials
        // (sum/bool_and are grain-associative), so the train gram
        // stream is scanned ONCE — the former separate shingleStats
        // branch re-ran the whole tokenize+probe pass (r13)
        probes.groupBy("doc_id")
          .agg(max(col("exact")).as("exact"), max(col("bloom")).as("bloom"),
            count(lit(1)).as("p_cnt"),
            count(when(col("bloom") && !col("exact"), 1)).as("fp_cnt"),
            coalesce(bool_and(!col("exact") || col("bloom")), lit(true))
              .as("no_fn"))
          .agg(
            count(lit(1)).as("n_train"),
            count(when(col("exact"), 1)).as("n_contaminated"),
            (coalesce(bool_and(!col("exact") || col("bloom")), lit(true)) &&
              coalesce(bool_and(col("no_fn")), lit(true)))
              .as("no_false_negatives_raw"),
            coalesce(sum(col("p_cnt")), lit(0L)).as("t_probes"),
            coalesce(sum(col("fp_cnt")), lit(0L)).as("n_fp"))
          .select(
            col("n_train"), col("n_contaminated"),
            col("no_false_negatives_raw").as("no_false_negatives"),
            (col("n_fp").cast("double") <=
              col("t_probes") * (5 * fpp) + 100).as("fp_within_bound"))
      },
      Some(
        s"""$decontamCte
           |SELECT
           |  (SELECT count(*) FROM sh WHERE split = 'train') AS n_train,
           |  (SELECT count(*) FROM hit) AS n_contaminated,
           |  TRUE AS no_false_negatives,
           |  TRUE AS fp_within_bound""".stripMargin)),

    // n-gram (token bigram) Jaccard over a bounded candidate block —
    // the exact quadratic baseline the LSH path approximates
    Q(
      "dedup_ngram_jaccard",
      (s, d) => {
        val grams = bigramSets(toks(s, d).filter(col("doc_id") < 150))
        val a = grams.select(col("doc_id").as("a_id"), col("g").as("ga"))
        val b = grams.select(col("doc_id").as("b_id"), col("g").as("gb"))
        a.join(b, col("a_id") < col("b_id"))
          .withColumn("inter",
            size(array_intersect(col("ga"), col("gb"))))
          .withColumn("jaccard",
            col("inter").cast("double") /
              greatest(size(col("ga")) + size(col("gb")) - col("inter"), lit(1)))
          .filter(col("jaccard") >= 0.4)
          .select(col("a_id"), col("b_id"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy("a_id", "b_id")
      },
      Some(
        s"""WITH cleaned AS (
           |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
           |  WHERE doc_id < 150
           |), toksrc AS (
           |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
           |), grams AS (
           |  SELECT doc_id, $bigramsSqlExpr AS g FROM toksrc
           |), j AS (
           |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           |    len(list_filter(a.g, x -> list_contains(b.g, x))) AS inter,
           |    len(a.g) AS la, len(b.g) AS lb
           |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
           |)
           |SELECT a_id, b_id,
           |  round(CAST(inter AS DOUBLE) / greatest(la + lb - inter, 1), 6) AS jaccard
           |FROM j
           |WHERE CAST(inter AS DOUBLE) / greatest(la + lb - inter, 1) >= 0.4
           |ORDER BY a_id, b_id""".stripMargin)),

    // EXACT set-similarity join over the WHOLE corpus via prefix
    // filtering (the AllPairs/PPJoin family: Bayardo et al. WWW'07,
    // Xiao et al. WWW'08) — where dedup_ngram_jaccard is the quadratic
    // baseline confined to a 150-doc eval block and MinHash trades
    // recall for speed, this is the exact-threshold scale path: every
    // pair with bigram Jaccard >= 0.5, no block bound, no probabilistic
    // misses. The filter: order each doc's gram set by GLOBAL document
    // frequency (rarest first, ties by gram — one total order both
    // engines compute identically), keep only the first
    // n - ceil(t*n) + 1 grams as join keys; any pair meeting J >= t
    // provably shares a prefix gram, so the equi-join on prefix grams
    // generates a complete candidate set. PrefixJaccardSpec
    // brute-force-checks that completeness property on random corpora.
    // Scale shape: df counting and the df join are linear token-stream
    // shuffles; the candidate join fans out only on PREFIX grams, which
    // by construction are each doc's RAREST — the high-df grams that
    // would explode a naive gram join sort to the suffix and never
    // become keys. A 2x size filter (J >= 0.5 forces
    // max(|a|,|b|) <= 2*min(|a|,|b|)) and the PPJoin positional bound
    // prune candidates before the exact verify, and the verify itself
    // is integer cross-multiplied (inter*2 >= union), never a float
    // compare. Nothing is quadratic in corpus size — candidates are
    // bounded by prefix co-occurrence, the quantity the algorithm
    // exists to minimize.
    //
    // MEASURED WORST CASE (sf0.1): the synthetic corpus has only ~931
    // distinct bigrams over 5,000 docs (every gram df~285 — no rare
    // grams for the prefix to exploit), so candidates are 5.5M of the
    // 12.5M possible pairs: near-adversarial for ANY prefix scheme.
    // Five fixes keep it linear-cost-per-candidate anyway, measured
    // 78 s -> ~8 s: (1) the verify's size(array_intersect) — a
    // per-row hash-set build — replaced by the codegen'd
    // SortedIntersectSize merge kernel over plain-sorted gram arrays;
    // (2) AQE's byte-targeted coalescing collapsed the tiny-bytes/
    // CPU-dense pair stream to 4 tasks (38 of 44 s), so the CPU-heavy
    // exchanges pin the session's shuffle parallelism explicitly;
    // (3) the doubly-consumed tokenize lineage spreads the one-split
    // scan before projecting; (4) the AllPairs ASYMMETRIC index
    // prefix (~n/3 on the canonically smaller doc vs the probe's
    // ~n/2) cuts candidate generation; (5) the verify runs TWO-PASS —
    // an xxhash64-array prescreen (8-byte elements in the pair
    // exchange, provably no false negatives) then exact string verify
    // on survivor docs only. The two-pass trade by regime: when
    // candidates >> true pairs (this corpus: 4.8M -> 256) it halves
    // the query; when candidates ~ true pairs (the salted probes,
    // where every candidate IS a near-dup) it costs ~12% — the verify
    // there is output-bound either way, which is the scale property
    // that matters. On a Zipf-vocabulary corpus (any real
    // text at 100 TB) the prefix filter does the heavy lifting these
    // constants can't — the 30x salted probe measures it near-FLAT
    // (35 s for 30x the docs; candidates collapse to 613k because the
    // rare salt grams own the prefixes — SCALE.md round-7 section,
    // which also records the broadcast-at-scale bug and the
    // salt-vs-normalizer probe-tool bug this probe surfaced). If
    // production data ever showed synthetic-grade density, the
    // mitigation path is suffix filtering (ppjoin+) or length-bucketed
    // re-partitioning of the high-df tail.
    Q(
      "dedup_prefix_jaccard",
      (s, d) => prefixJaccardPairs(s, d).orderBy("a_id", "b_id"),
      Some(prefixJaccardSql)),

    // Per-doc NEAREST-DUPLICATE report — the lookup a curation UI
    // serves ("which doc is this one's duplicate, and how close"):
    // every document joined to its best J >= 0.5 partner (highest
    // jaccard, ties to the lowest other id) plus its duplicate-partner
    // count, NULLs where the doc has none. Pure composition over the
    // shared prefixJaccardPairs machinery: the pair set is
    // output-sized (true near-dup pairs, never candidates), so the
    // symmetrized frame, the per-doc rank window, and the left join
    // back to the corpus are all duplicate-mass-bounded — the corpus
    // is touched once for the id spine.
    Q(
      "dedup_nearest_dup",
      (s, d) => {
        val pairs = prefixJaccardPairs(s, d)
        val sym = pairs.select(col("a_id").as("doc_id"),
          col("b_id").as("other_id"), col("jaccard"))
          .unionByName(pairs.select(col("b_id").as("doc_id"),
            col("a_id").as("other_id"), col("jaccard")))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("jaccard").desc, col("other_id"))
        val best = sym
          .withColumn("rn", row_number().over(w))
          .withColumn("nd", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("other_id").as("nearest_id"),
            col("jaccard").as("nearest_jaccard"), col("nd"))
        Tables.t(s, d, "documents").select("doc_id")
          .join(best, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("nearest_id"),
            col("nearest_jaccard"),
            coalesce(col("nd"), lit(0L)).as("n_dups"))
          .orderBy("doc_id")
      },
      Some(
        s"""WITH pj AS (
           |  SELECT * FROM ($prefixJaccardSql) t
           |), sym AS (
           |  SELECT a_id AS doc_id, b_id AS other_id, jaccard FROM pj
           |  UNION ALL
           |  SELECT b_id, a_id, jaccard FROM pj
           |), best AS (
           |  SELECT doc_id, other_id, jaccard,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY jaccard DESC, other_id) AS rn,
           |    count(*) OVER (PARTITION BY doc_id) AS nd
           |  FROM sym
           |)
           |SELECT d.doc_id, b.other_id AS nearest_id,
           |  b.jaccard AS nearest_jaccard,
           |  CAST(coalesce(b.nd, 0) AS BIGINT) AS n_dups
           |FROM documents d
           |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin)),

    // Exact SUBSTRING dedup at fixed window granularity — the
    // document-level near-dup passes above miss the "same paragraph
    // pasted into otherwise-different pages" case, the dominant
    // duplication mode of web corpora (reference point: the
    // suffix-array ExactSubstr dedup of Lee et al., "Deduplicating
    // Training Data Makes Language Models Better", ACL'22; a
    // distributed suffix array is replaced here by rolling w-token
    // window digests, which find every duplicated run of >= w tokens).
    // Per doc: how many of its distinct 12-token windows also occur in
    // ANOTHER doc, as a duplicated-span ratio for downstream filtering.
    // Scale shape: ~one window per token, so the explode is O(corpus
    // tokens) — the same size as the token stream every text query
    // already scans; windows travel as md5 digests (16 bytes), never
    // token strings. Three linear shuffles: per-doc distinct, per-window
    // doc-count (a whole-partition window count — no per-key state
    // beyond a long), per-doc rollup. Nothing is quadratic: a window
    // shared by k docs costs k rows, not k² pairs, because the output
    // is per-doc ratios, not pairs.
    Q(
      "dedup_substring_windows",
      (s, d) => {
        val W = 12
        val wcount = org.apache.spark.sql.expressions.Window
          .partitionBy("wh1", "wh2")
        toks(s, d)
          .filter(size(col("tok")) >= W)
          .select(col("doc_id"),
            explode(transform(sequence(lit(1), size(col("tok")) - (W - 1)),
              i => struct(
                xxhash64(slice(col("tok"), i, lit(W))).as("wh1"),
                winKey2(slice(col("tok"), i, lit(W))).as("wh2"))))
              .as("p"))
          .select(col("doc_id"), col("p.wh1").as("wh1"),
            col("p.wh2").as("wh2"))
          .distinct()
          .withColumn("n_docs", count(lit(1)).over(wcount))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_windows"),
            count(when(col("n_docs") >= 2, 1)).as("n_shared"))
          .filter(col("n_shared") > 0)
          .select(col("doc_id"), col("n_windows"), col("n_shared"),
            round(col("n_shared").cast("double") / col("n_windows"), 6)
              .as("dup_ratio"))
          .orderBy("doc_id")
      },
      Some(
        s"""WITH cleaned AS (
           |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
           |), toksrc AS (
           |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
           |), w AS (
           |  SELECT doc_id, tok, len(tok) AS n FROM toksrc WHERE len(tok) >= 12
           |), ex AS (
           |  SELECT DISTINCT doc_id,
           |    md5(array_to_string(list_slice(tok, CAST(i AS INT),
           |      CAST(i AS INT) + 11), ' ')) AS wh
           |  FROM (SELECT doc_id, tok, unnest(range(1, n - 10)) AS i FROM w)
           |), c AS (
           |  SELECT doc_id, wh, count(*) OVER (PARTITION BY wh) AS n_docs
           |  FROM ex
           |)
           |SELECT doc_id, count(*) AS n_windows,
           |  count(CASE WHEN n_docs >= 2 THEN 1 END) AS n_shared,
           |  round(CAST(count(CASE WHEN n_docs >= 2 THEN 1 END) AS DOUBLE)
           |    / count(*), 6) AS dup_ratio
           |FROM c GROUP BY doc_id
           |HAVING count(CASE WHEN n_docs >= 2 THEN 1 END) > 0
           |ORDER BY doc_id""".stripMargin)),

    // VARIABLE-LENGTH ExactSubstr SPANS — the headline capability of
    // Lee et al. ACL'22's suffix-array dedup that the fixed-granularity
    // window query above cannot express: TRUE duplicated-span
    // boundaries per document, not 12-token quantized hits. Realized as
    // the doc-merge form: every shared window START POSITION (its
    // 12-token hash appears in >= 2 distinct docs) marks tokens
    // [i, i+11] duplicated; a span is a maximal contiguous run of
    // duplicated TOKENS — the interval merge of those covers, realized
    // as lag-gap islands (same span iff start gap <= W; see
    // substringSpans for the proof that the emitted spans are
    // token-disjoint, fully covered, and maximal — a start-space run
    // merge alone would emit overlapping spans when 0 < gap < W). The
    // output rows are the spans a dedup pass would cut — Lee et al.'s
    // actionable artifact. Shape: the SAME three shuffles as the
    // window query (explode -> hash-grouped doc counts -> per-doc
    // island grouping on a PARTITIONED window, never global). At
    // 100 TB the position table is the corpus x ~1 row/token — the
    // published algorithm's real cost, here bounded to shared
    // positions after the semi join.
    Q(
      "dedup_substring_spans",
      (s, d) =>
        substringSpans(s, d).orderBy("doc_id", "span_start"),
      Some(
        s"""WITH $spanCte
           |SELECT doc_id, span_start, span_end, span_len FROM spans
           |ORDER BY doc_id, span_start""".stripMargin)),

    // SPAN SAVINGS — what cutting the spans would actually reclaim:
    // per dyadic span-length band (bucket = ⌊log2 span_len⌋, the
    // ev_user_activity_pareto trick), the span count, the duplicated
    // tokens they cover (spans within a doc are TOKEN-disjoint after
    // the interval merge — see substringSpans — so the sum is the
    // exact union coverage), and that mass as a share of ALL corpus
    // tokens — the number a dedup pass quotes before running. The
    // long-band rows are the ones worth acting on (one 200-token span
    // outweighs dozens of 12-token hits); a corpus whose mass sits in
    // the minimum band has boilerplate, not plagiarism. Same lineage
    // as the spans query (shared memoized frame); the summary adds one
    // bounded band aggregate + a 1-row total broadcast.
    Q(
      "dedup_span_savings",
      (s, d) => {
        val tot = toks(s, d)
          .agg(coalesce(sum(size(col("tok"))), lit(0L)).cast("long")
            .as("total_tokens"))
        substringSpans(s, d)
          .withColumn("band", (length(bin(col("span_len"))) - 1).cast("int"))
          .groupBy("band")
          .agg(count(lit(1)).cast("long").as("n_spans"),
            sum(col("span_len")).cast("long").as("span_tokens"))
          .crossJoin(broadcast(tot))
          .select(col("band"), col("n_spans"), col("span_tokens"),
            when(col("total_tokens") === 0, lit(null).cast("double"))
              .otherwise(round(col("span_tokens").cast("double") /
                col("total_tokens"), 6)).as("token_share"))
          .orderBy("band")
      },
      Some(
        s"""WITH $spanCte, tot AS (
           |  SELECT CAST(coalesce(sum(len(tok)), 0) AS BIGINT)
           |    AS total_tokens
           |  FROM toksrc
           |)
           |SELECT CAST(length(bin(span_len)) - 1 AS INT) AS band,
           |  CAST(count(*) AS BIGINT) AS n_spans,
           |  CAST(sum(span_len) AS BIGINT) AS span_tokens,
           |  CASE WHEN tot.total_tokens = 0 THEN NULL
           |    ELSE round(CAST(sum(span_len) AS DOUBLE)
           |      / tot.total_tokens, 6) END AS token_share
           |FROM spans CROSS JOIN tot
           |GROUP BY band, tot.total_tokens ORDER BY band""".stripMargin)),

    // SPAN SAVINGS BY SOURCE — which feed carries the duplicated-span
    // mass (the actionable decomposition: a source whose token_share
    // dwarfs the others is a boilerplate-heavy feed to fix at INGEST,
    // cheaper than deduping it forever downstream). Same memoized span
    // lineage joined to the per-doc source attribute; denominators are
    // each source's OWN token total, so the shares are comparable
    // across sources of different sizes — and the decomposition can
    // never disagree with dedup_span_savings' corpus totals (same
    // spans frame, partitioned by an attribute). LEFT join keeps
    // span-free sources as zero rows (the healthy-feed baseline).
    Q(
      "dedup_span_savings_by_source",
      (s, d) => {
        val src = Tables.t(s, d, "documents")
          .select(col("doc_id"),
            coalesce(col("source"), lit("")).as("source"))
        val tok = toks(s, d)
          .select(col("doc_id"), size(col("tok")).as("n_tok"))
          .join(src, "doc_id")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("n_tok")), lit(0L)).cast("long")
              .as("src_tokens"))
        val sp = substringSpans(s, d)
          .join(src, "doc_id")
          .groupBy("source")
          .agg(countDistinct(col("doc_id")).as("n_span_docs"),
            count(lit(1)).cast("long").as("n_spans"),
            sum(col("span_len")).cast("long").as("span_tokens"))
        tok.join(sp, Seq("source"), "left")
          .select(col("source"), col("n_docs"),
            coalesce(col("n_span_docs"), lit(0L)).cast("long")
              .as("n_span_docs"),
            coalesce(col("n_spans"), lit(0L)).cast("long").as("n_spans"),
            coalesce(col("span_tokens"), lit(0L)).cast("long")
              .as("span_tokens"),
            col("src_tokens"),
            when(col("src_tokens") === 0, lit(null).cast("double"))
              .otherwise(round(
                coalesce(col("span_tokens"), lit(0L)).cast("double") /
                  col("src_tokens"), 6)).as("token_share"))
          .orderBy("source")
      },
      Some(
        s"""WITH $spanCte, src AS (
           |  SELECT doc_id, coalesce(source, '') AS source
           |  FROM documents
           |), tokt AS (
           |  SELECT s.source, count(*) AS n_docs,
           |    CAST(coalesce(sum(len(t.tok)), 0) AS BIGINT) AS src_tokens
           |  FROM toksrc t JOIN src s USING (doc_id)
           |  GROUP BY 1
           |), spt AS (
           |  SELECT s.source,
           |    count(DISTINCT p.doc_id) AS n_span_docs,
           |    count(*) AS n_spans,
           |    CAST(sum(p.span_len) AS BIGINT) AS span_tokens
           |  FROM spans p JOIN src s USING (doc_id)
           |  GROUP BY 1
           |)
           |SELECT t.source,
           |  CAST(t.n_docs AS BIGINT) AS n_docs,
           |  CAST(coalesce(sp.n_span_docs, 0) AS BIGINT) AS n_span_docs,
           |  CAST(coalesce(sp.n_spans, 0) AS BIGINT) AS n_spans,
           |  CAST(coalesce(sp.span_tokens, 0) AS BIGINT) AS span_tokens,
           |  t.src_tokens,
           |  CASE WHEN t.src_tokens = 0 THEN NULL
           |    ELSE round(CAST(coalesce(sp.span_tokens, 0) AS DOUBLE)
           |      / t.src_tokens, 6) END AS token_share
           |FROM tokt t LEFT JOIN spt sp USING (source)
           |ORDER BY t.source""".stripMargin)),

    // SPANS APPLIED — the ACT step that completes the span family
    // (detect: dedup_substring_spans; price: dedup_span_savings; act:
    // this): the corpus with every duplicated span CUT, per document —
    // kept token count, cut token count, and an md5 over the kept
    // token stream in order (the verifiable artifact of the cut; a
    // downstream writer would emit the kept tokens themselves). This
    // is the cut-all form — every occurrence of duplicated text goes,
    // the aggressive end of Lee et al.'s policy spectrum; keep-one-
    // canonical is a policy layer over the same span frame (pick the
    // corpus-min owner per span hash), not a different engine op.
    // Shape: only span-owning docs re-tokenize (semi join on the span
    // doc set BEFORE the explode); coverage is a per-doc hash join of
    // positions to the bounded span list with a range predicate —
    // never a position x position product; assembly is one per-doc
    // sort inside an aggregate. Docs cut to nothing stay as rows
    // (n_kept = 0, hash of the empty stream) — silently dropping them
    // would misreport the reclaimed mass.
    Q(
      "dedup_spans_applied",
      (s, d) => {
        val sp = substringSpans(s, d)
        val sdocs = sp.select("doc_id").distinct()
        val pos = toks(s, d)
          .join(broadcast(sdocs), Seq("doc_id"), "left_semi")
          .select(col("doc_id"),
            posexplode(col("tok")).as(Seq("i0", "term")))
          .select(col("doc_id"), (col("i0") + 1).as("i"), col("term"))
        val spn = sp.select(col("doc_id").as("sdoc"),
          col("span_start"), col("span_end"))
        // Spans are token-disjoint per doc (DedupSpansSpec pins the
        // strict-gap invariant), so a LEFT join marks each position at
        // most once and one aggregate reads off n_tokens / n_kept /
        // kept-stream hash in a single pass — the former anti join +
        // separate length branch + final outer join tokenized the
        // corpus twice and paid two extra joins (r13, guide §3.3/§5).
        pos.join(broadcast(spn),
            col("doc_id") === col("sdoc") &&
              col("i") >= col("span_start") && col("i") <= col("span_end"),
            "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            coalesce(sum(when(col("sdoc").isNull, 1L)), lit(0L))
              .as("n_kept"),
            md5(array_join(transform(
              array_sort(collect_list(when(col("sdoc").isNull,
                struct(col("i"), col("term"))))),
              x => x.getField("term")), " ")).as("kept_hash"))
          .select(col("doc_id"), col("n_tokens").cast("int").as("n_tokens"),
            (col("n_tokens") - col("n_kept")).cast("int").as("n_cut"),
            col("n_kept").cast("int").as("n_kept"),
            col("kept_hash"))
          .orderBy("doc_id")
      },
      Some(
        s"""WITH $spanCte, sdocs AS (
           |  SELECT DISTINCT doc_id FROM spans
           |), pos2 AS (
           |  SELECT doc_id, CAST(i AS INT) AS i,
           |    tok[CAST(i AS INT)] AS term
           |  FROM (SELECT s.doc_id, s.tok,
           |          unnest(range(1, len(s.tok) + 1)) AS i
           |        FROM toksrc s JOIN sdocs USING (doc_id))
           |), kept2 AS (
           |  SELECT p.doc_id, p.i, p.term FROM pos2 p
           |  WHERE NOT EXISTS (SELECT 1 FROM spans sp
           |    WHERE sp.doc_id = p.doc_id
           |      AND p.i BETWEEN sp.span_start AND sp.span_end)
           |), agg2 AS (
           |  SELECT doc_id, count(*) AS n_kept,
           |    md5(string_agg(term, ' ' ORDER BY i)) AS kept_hash
           |  FROM kept2 GROUP BY doc_id
           |), lens2 AS (
           |  SELECT t.doc_id, len(t.tok) AS n_tokens
           |  FROM toksrc t JOIN sdocs USING (doc_id)
           |)
           |SELECT l.doc_id, CAST(l.n_tokens AS INT) AS n_tokens,
           |  CAST(l.n_tokens - coalesce(a.n_kept, 0) AS INT) AS n_cut,
           |  CAST(coalesce(a.n_kept, 0) AS INT) AS n_kept,
           |  coalesce(a.kept_hash, md5('')) AS kept_hash
           |FROM lens2 l LEFT JOIN agg2 a USING (doc_id)
           |ORDER BY l.doc_id""".stripMargin)),

    // INCREMENTAL SPANS — the batch-proportional form of the span
    // query: for each NEW-batch (val-split) document, the maximal
    // spans of text ALREADY PRESENT in the train corpus (window hash
    // exists in any train doc). This is the ingest-time question
    // ("how much of this crawl is already in my corpus, and exactly
    // where") asked the way a 100 TB system can afford: the corpus's
    // window-hash set is a keyed index built once, the new batch's
    // positions probe it with a semi join — cost scales with the
    // BATCH, the corpus is touched once (the dedup_incremental_batch
    // contract, at span granularity). Run merge identical to
    // dedup_substring_spans.
    Q(
      "dedup_incremental_spans",
      (s, d) => {
        val W = 12
        val pos = toks(s, d)
          .withColumn("split", splitCol)
          .filter(size(col("tok")) >= W)
          .select(col("doc_id"), col("split"),
            explode(transform(
              sequence(lit(1), size(col("tok")) - (W - 1)),
              i => struct(i.as("i"),
                xxhash64(slice(col("tok"), i, lit(W))).as("wh1"),
                winKey2(slice(col("tok"), i, lit(W))).as("wh2"))))
              .as("p"))
          .select(col("doc_id"), col("split"),
            col("p.i").as("i"), col("p.wh1").as("wh1"),
            col("p.wh2").as("wh2"))
        val corpusHashes = pos.filter(col("split") === "train")
          .select("wh1", "wh2").distinct()
        val sp = pos.filter(col("split") === "val")
          .join(corpusHashes, Seq("wh1", "wh2"), "left_semi")
          .select("doc_id", "i")
        val wRun = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("i")
        // interval merge, not start-run merge (see substringSpans)
        sp.withColumn("new_run",
            when(col("i") - lag(col("i"), 1).over(wRun) <= W, lit(0L))
              .otherwise(lit(1L)))
          .withColumn("grp", sum(col("new_run")).over(wRun))
          .groupBy(col("doc_id"), col("grp"))
          .agg(min(col("i")).as("span_start"),
            (max(col("i")) + (W - 1)).as("span_end"),
            (max(col("i")) - min(col("i")) + W).as("span_len"))
          .select(col("doc_id"),
            col("span_start").cast("int").as("span_start"),
            col("span_end").cast("int").as("span_end"),
            col("span_len").cast("int").as("span_len"))
          .orderBy("doc_id", "span_start")
      },
      Some(
        s"""WITH cleaned AS (
           |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
           |), toksrc AS (
           |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
           |), w AS (
           |  SELECT doc_id, tok, len(tok) AS n, $splitCaseSql AS split
           |  FROM toksrc WHERE len(tok) >= 12
           |), pos AS (
           |  SELECT doc_id, split, CAST(i AS INT) AS i,
           |    md5(array_to_string(list_slice(tok, CAST(i AS INT),
           |      CAST(i AS INT) + 11), ' ')) AS wh
           |  FROM (SELECT doc_id, split, tok, unnest(range(1, n - 10)) AS i
           |        FROM w)
           |), ch AS (
           |  SELECT DISTINCT wh FROM pos WHERE split = 'train'
           |), sp AS (
           |  SELECT p.doc_id, p.i FROM pos p JOIN ch USING (wh)
           |  WHERE p.split = 'val'
           |), runs AS (
           |  SELECT doc_id, i,
           |    CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)
           |      <= 12 THEN 0 ELSE 1 END AS new_run
           |  FROM sp
           |), islands AS (
           |  SELECT doc_id, i,
           |    sum(new_run) OVER (PARTITION BY doc_id ORDER BY i) AS grp
           |  FROM runs
           |)
           |SELECT doc_id, CAST(min(i) AS INT) AS span_start,
           |  CAST(max(i) + 11 AS INT) AS span_end,
           |  CAST(max(i) - min(i) + 12 AS INT) AS span_len
           |FROM islands GROUP BY doc_id, grp
           |ORDER BY doc_id, span_start""".stripMargin)),

    // Asymmetric CONTAINMENT over the candidate pairs: Jaccard misses
    // doc-in-doc duplication (a quote or a full article pasted into a
    // longer page scores low symmetric overlap but ~1.0 containment on
    // the smaller side). |A∩B| and both set sizes are emitted as exact
    // integers and the >= 0.9 smaller-side flag as a cross-multiplied
    // integer compare — no float at the boundary. Shape: the persisted
    // pair set bounds everything — candidate ids broadcast-semi-join the
    // corpus BEFORE any shingling, so the verify stage scales with
    // candidates, not corpus (the emb_text_crosscheck lesson).
    Q(
      "dedup_containment",
      (s, d) => {
        val pairs = minhashPairs(s, d).select("a_id", "b_id")
        val candIds = pairs.select(col("a_id").as("doc_id"))
          .unionByName(pairs.select(col("b_id").as("doc_id"))).distinct()
        // bounded (candidate docs only) and consumed by BOTH join
        // sides — persist so the shingling runs once (r13, guide §5)
        val sets = graft.CacheRegistry.track(s,
          shingleSets(toksFor(s, d, candIds)))
        pairs
          .join(sets.select(col("doc_id").as("a_id"), col("st").as("sa")),
            "a_id")
          .join(sets.select(col("doc_id").as("b_id"), col("st").as("sb")),
            "b_id")
          .select(col("a_id"), col("b_id"),
            size(array_intersect(col("sa"), col("sb"))).as("inter"),
            size(col("sa")).as("size_a"), size(col("sb")).as("size_b"))
          .withColumn("contained",
            col("inter") * 10 >= least(col("size_a"), col("size_b")) * 9)
          .orderBy("a_id", "b_id")
      },
      Some(
        s"""WITH pairs AS (
           |  SELECT a_id, b_id FROM ($minhashSql)
           |), cand_ids AS (
           |  SELECT a_id AS doc_id FROM pairs
           |  UNION SELECT b_id FROM pairs
           |), cl AS (
           |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
           |  WHERE doc_id IN (SELECT doc_id FROM cand_ids)
           |), tk AS (
           |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cl
           |), sets AS (
           |  SELECT doc_id, list_distinct($shingleSqlExpr) AS st
           |  FROM tk
           |), j AS (
           |  SELECT p.a_id, p.b_id,
           |    len(list_filter(sa.st, x -> list_contains(sb.st, x))) AS inter,
           |    len(sa.st) AS size_a, len(sb.st) AS size_b
           |  FROM pairs p
           |  JOIN sets sa ON sa.doc_id = p.a_id
           |  JOIN sets sb ON sb.doc_id = p.b_id
           |)
           |SELECT a_id, b_id, inter, size_a, size_b,
           |  inter * 10 >= least(size_a, size_b) * 9 AS contained
           |FROM j ORDER BY a_id, b_id""".stripMargin)),

    // SUB-WINDOW LONGEST COMMON RUN — the span queries' last fidelity
    // gap closed (Lee et al.'s suffix-array longest-match, realized
    // within the bounded candidate pair set): per minhash candidate
    // pair, the LONGEST exact common token run at ONE-token
    // granularity — no 12-token window quantization. The Spark side
    // runs the PRODUCTION kernel: per-pair suffix automaton of A's
    // tokens + one pass of B (graft.functions.LongestCommonRun,
    // O(|A|+|B|) flat — immune to the adversarial repeated-token
    // blowup, where a match-matrix equi-join pays O(f_A*f_B) rows per
    // repeated token). The pair set bounds everything: candidate ids
    // broadcast-semi-join the corpus BEFORE tokenizing (the
    // containment convention), each pair ships exactly two token
    // arrays to one task, and the kernel runs inside mapPartitions —
    // a JUSTIFIED mapPartitions: the per-pair automaton is genuinely
    // imperative, and the declarative twin stays fully alive as the
    // DuckDB oracle below (the diagonal gaps-and-islands form, which
    // the gate cross-checks hash-exactly, adversarial pairs included;
    // DedupLongestRunSpec adds an independent O(n*m) DP). Ties break
    // (max run_len, min a_start, min b_start); pairs sharing no token
    // emit nothing. Starts are 1-based like the span queries.
    Q(
      "dedup_pair_longest_run",
      (s, d) => {
        import s.implicits._
        val pairs = minhashPairs(s, d).select("a_id", "b_id")
        val ids = pairs.select(col("a_id").as("doc_id"))
          .unionByName(pairs.select(col("b_id").as("doc_id"))).distinct()
        val toks = toksFor(s, d, ids)
        pairs
          .join(toks.select(col("doc_id").as("a_id"),
            col("tok").as("atok")), Seq("a_id"))
          .join(toks.select(col("doc_id").as("b_id"),
            col("tok").as("btok")), Seq("b_id"))
          .select(col("a_id"), col("b_id"), col("atok"), col("btok"))
          .as[(Long, Long, Seq[String], Seq[String])]
          .mapPartitions(_.flatMap { case (aId, bId, atok, btok) =>
            val a = Option(atok).getOrElse(Seq.empty).toIndexedSeq
            val b = Option(btok).getOrElse(Seq.empty).toIndexedSeq
            val (runLen, aStart, bStart) =
              graft.functions.LongestCommonRun(a, b)
            if (runLen == 0) Iterator.empty
            else Iterator((aId, bId, runLen, aStart, bStart))
          })
          .toDF("a_id", "b_id", "run_len", "a_start", "b_start")
          .orderBy("a_id", "b_id")
      },
      Some(
        s"""WITH pairs AS (
           |  SELECT a_id, b_id FROM ($minhashSql)
           |), cand_ids AS (
           |  SELECT a_id AS doc_id FROM pairs
           |  UNION SELECT b_id FROM pairs
           |), cl AS (
           |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
           |  WHERE doc_id IN (SELECT doc_id FROM cand_ids)
           |), tk AS (
           |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cl
           |), pos AS (
           |  SELECT doc_id, CAST(i AS INT) AS i, tok[CAST(i AS INT)] AS term
           |  FROM (SELECT doc_id, tok, unnest(range(1, len(tok) + 1)) AS i
           |        FROM tk)
           |), m AS (
           |  SELECT p.a_id, p.b_id, pa.i AS ai, pb.i AS bi,
           |    pa.i - pb.i AS diag
           |  FROM pairs p
           |  JOIN pos pa ON pa.doc_id = p.a_id
           |  JOIN pos pb ON pb.doc_id = p.b_id AND pb.term = pa.term
           |), r1 AS (
           |  SELECT *, CASE WHEN ai - lag(ai) OVER (
           |      PARTITION BY a_id, b_id, diag ORDER BY ai) = 1
           |    THEN 0 ELSE 1 END AS new_run
           |  FROM m
           |), r2 AS (
           |  SELECT *, sum(new_run) OVER (
           |      PARTITION BY a_id, b_id, diag ORDER BY ai) AS grp
           |  FROM r1
           |), runs AS (
           |  SELECT a_id, b_id, diag, grp, count(*) AS run_len,
           |    min(ai) AS a_start, min(bi) AS b_start
           |  FROM r2 GROUP BY 1, 2, 3, 4
           |)
           |SELECT a_id, b_id, CAST(run_len AS INT) AS run_len,
           |  CAST(a_start AS INT) AS a_start,
           |  CAST(b_start AS INT) AS b_start
           |FROM (SELECT *, row_number() OVER (PARTITION BY a_id, b_id
           |    ORDER BY run_len DESC, a_start, b_start) AS rn
           |  FROM runs)
           |WHERE rn = 1 ORDER BY a_id, b_id""".stripMargin)),

    // PER-DOC TOKEN-EXACT SPANS — the span family's LAST quantization
    // gap closed (round 12 left dedup_substring_spans W=12
    // window-cover quantized; this emits the exact duplicated-token
    // intervals): for every doc in the candidate pair set, the merged
    // 1-based intervals of every token sitting inside a maximal
    // common run of >= 12 tokens with ANY of its minhash partners —
    // both sides of every pair are covered (doc as A and as B).
    // Spark side runs the suffix-automaton kernel's coverage pass
    // (LongestCommonRun.coverage, O(|A|+|B|) per direction): the
    // union of suffix windows [pos-l(pos)+1, pos] at match length
    // l >= 12 equals the union of maximal-run intervals >= 12 (each
    // run's own end position covers it; every window extends to a
    // containing run), so no occurrence enumeration and no match
    // matrix. Per-doc interval union is one doc_id-keyed window
    // chain (running-max merge — overlapping AND adjacent intervals
    // coalesce, exactly the covered-position islands). The DuckDB
    // oracle recomputes from the diagonal-island match matrix: runs
    // >= 12, both sides' intervals, the same running-max merge — the
    // gate cross-checks kernel vs matrix hash-exactly, adversarial
    // repeated-token pairs included.
    Q(
      "dedup_doc_token_spans",
      (s, d) => docTokenSpans(s, d).orderBy("doc_id", "span_start"),
      Some(
        s"""WITH $docTokenSpanCte
           |SELECT doc_id, span_start, span_end, span_len
           |FROM dts_spans
           |ORDER BY doc_id, span_start""".stripMargin)),

    // TOKEN-EXACT SPANS APPLIED — the act step over the token-exact
    // span frame (detect: dedup_doc_token_spans; act: this), the
    // dedup_spans_applied contract at one-token granularity: per
    // span-owning doc, kept/cut counts and the md5 of the kept token
    // stream with every token-exact duplicated interval removed. The
    // window-quantized act step cuts whole 12-token windows around
    // every shared position; this cuts exactly the duplicated runs —
    // the difference IS the quantization mass, visible as n_cut deltas
    // between the two queries' rows. Same bounded shape: only
    // span-owning docs re-tokenize (semi join before the explode),
    // positions hash-join the bounded per-doc span list with a range
    // predicate, assembly is one per-doc sort inside an aggregate.
    Q(
      "dedup_token_spans_applied",
      (s, d) => {
        val sp = docTokenSpans(s, d)
        val sdocs = sp.select("doc_id").distinct()
        // toksFor, not toks+semi: the semi join prunes BELOW the
        // tokenize projection, so only span-owning docs ever pay
        // graft_norm_tokens (the toksFor convention — plan-audited)
        val pos = toksFor(s, d, sdocs)
          .select(col("doc_id"),
            posexplode(col("tok")).as(Seq("i0", "term")))
          .select(col("doc_id"), (col("i0") + 1).as("i"), col("term"))
        val spn = sp.select(col("doc_id").as("sdoc"),
          col("span_start"), col("span_end"))
        // Spans are token-disjoint per doc (next span_start >
        // prev span_end + 1 — the interval-merge invariant), so a LEFT
        // join marks each position at most once and one aggregate reads
        // off n_tokens (all rows), n_kept (unmarked rows) and the kept
        // stream hash in a single pass. The former shape (anti join +
        // separate length branch + final outer join) embedded the
        // tokenize lineage twice and paid two extra joins (r13, guide
        // §3.3/§5: plan size and join count).
        pos.join(broadcast(spn),
            col("doc_id") === col("sdoc") &&
              col("i") >= col("span_start") && col("i") <= col("span_end"),
            "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            coalesce(sum(when(col("sdoc").isNull, 1L)), lit(0L))
              .as("n_kept"),
            md5(array_join(transform(
              array_sort(collect_list(when(col("sdoc").isNull,
                struct(col("i"), col("term"))))),
              x => x.getField("term")), " ")).as("kept_hash"))
          .select(col("doc_id"), col("n_tokens").cast("int").as("n_tokens"),
            (col("n_tokens") - col("n_kept")).cast("int").as("n_cut"),
            col("n_kept").cast("int").as("n_kept"),
            col("kept_hash"))
          .orderBy("doc_id")
      },
      Some(
        s"""WITH $docTokenSpanCte, sdocs AS (
           |  SELECT DISTINCT doc_id FROM dts_spans
           |), dpos AS (
           |  SELECT doc_id, CAST(i AS INT) AS i,
           |    tok[CAST(i AS INT)] AS term
           |  FROM (SELECT t.doc_id, t.tok,
           |          unnest(range(1, len(t.tok) + 1)) AS i
           |        FROM dts_tk t JOIN sdocs USING (doc_id))
           |), dkept AS (
           |  SELECT p.doc_id, p.i, p.term FROM dpos p
           |  WHERE NOT EXISTS (SELECT 1 FROM dts_spans sp
           |    WHERE sp.doc_id = p.doc_id
           |      AND p.i BETWEEN sp.span_start AND sp.span_end)
           |), dagg AS (
           |  SELECT doc_id, count(*) AS n_kept,
           |    md5(string_agg(term, ' ' ORDER BY i)) AS kept_hash
           |  FROM dkept GROUP BY doc_id
           |), dlens AS (
           |  SELECT t.doc_id, len(t.tok) AS n_tokens
           |  FROM dts_tk t JOIN sdocs USING (doc_id)
           |)
           |SELECT l.doc_id, CAST(l.n_tokens AS INT) AS n_tokens,
           |  CAST(l.n_tokens - coalesce(a.n_kept, 0) AS INT) AS n_cut,
           |  CAST(coalesce(a.n_kept, 0) AS INT) AS n_kept,
           |  coalesce(a.kept_hash, md5('')) AS kept_hash
           |FROM dlens l LEFT JOIN dagg a USING (doc_id)
           |ORDER BY l.doc_id""".stripMargin)),

    // Canonical-document selection per duplicate cluster: the resolution
    // policy a real pipeline applies after clustering — keep the most
    // content-rich member (max token count, doc_id tie-break), not
    // blindly the lowest id. Runs through the custom GroupedTopK
    // operator (k=1 per cluster: at most one row per cluster crosses
    // the exchange) over the SAME memoized cc-label lineage
    // dedup_cc_clusters persists; labels are cluster-members only
    // (bounded), so they broadcast into the token-count join and the
    // corpus is never shuffled. toksFor places the broadcast semi-join
    // BELOW the tokenize projection, so only cluster MEMBERS pay
    // tokenization — the SQL twin's `WHERE doc_id IN (…comp)` prune,
    // mirrored explicitly (Catalyst won't reorder it for us).
    Q(
      "dedup_cc_canonical",
      (s, d) => {
        val members = ccLabels(s, d)
          .select(col("id").as("doc_id"), col("cluster_id"))
        val nt = toksFor(s, d, members.select("doc_id"))
          .select(col("doc_id"), size(col("tok")).as("n_tokens"))
        val m = nt.join(broadcast(members), "doc_id")
        val best = graft.plans.GroupedTopK(
          m, Seq("cluster_id"), Seq(m("n_tokens").desc, m("doc_id")), k = 1)
        val sizes = members.groupBy("cluster_id")
          .agg(count(lit(1)).as("n_members"))
        best.join(sizes, "cluster_id")
          .select(col("cluster_id"), col("doc_id").as("canonical_id"),
            col("n_tokens"), col("n_members"))
          .orderBy("cluster_id")
      },
      Some(
        s"""WITH RECURSIVE pairs AS (
           |  $minhashSql
           |), edges AS (
           |  SELECT a_id AS u, b_id AS v FROM pairs
           |  UNION
           |  SELECT b_id, a_id FROM pairs
           |), nodes AS (
           |  SELECT DISTINCT u AS id FROM edges
           |), reach(id, lab) AS (
           |  SELECT id, id FROM nodes
           |  UNION
           |  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.id
           |), comp AS (
           |  SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id
           |), cl AS (
           |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
           |  WHERE doc_id IN (SELECT doc_id FROM comp)
           |), tk AS (
           |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cl
           |), m AS (
           |  SELECT c.cluster_id, c.doc_id, len(t.tok) AS n_tokens
           |  FROM comp c JOIN tk t USING (doc_id)
           |), r AS (
           |  SELECT cluster_id, doc_id, n_tokens,
           |    row_number() OVER (PARTITION BY cluster_id
           |      ORDER BY n_tokens DESC, doc_id) AS rn,
           |    count(*) OVER (PARTITION BY cluster_id) AS n_members
           |  FROM m
           |)
           |SELECT cluster_id, doc_id AS canonical_id, n_tokens, n_members
           |FROM r WHERE rn = 1 ORDER BY cluster_id""".stripMargin)),

    // Banding-quality evaluation: recall/precision of the MinHash+LSH
    // pipeline against ground truth on the bounded doc_id < 150 block —
    // the measurement that decides whether Bands x RowsPerBand needs
    // retuning before a corpus run ("measure, don't guess" for the
    // dedup index, the emb_recall_eval twin on the text side). Ground
    // truth = exact all-pairs Jaccard >= 0.5 on the SAME 3-token
    // shingle sets the verify stage uses, so precision is 1.0 by
    // construction (every reported pair re-verified exactly) and the
    // interesting number is recall: pairs LOST because no band
    // agreed. The quadratic truth join is confined to the 150-doc
    // block; the found side reuses the memoized pair lineage.
    Q(
      "dedup_minhash_recall",
      (s, d) => {
        val truth = exactTruthPairs(s, d)
        val found = minhashPairs(s, d)
          .filter(col("a_id") < 150 && col("b_id") < 150)
          .select("a_id", "b_id")
        val nT = truth.agg(count(lit(1)).as("n_true"))
        val nF = found.agg(count(lit(1)).as("n_found"))
        val nO = truth.join(found, Seq("a_id", "b_id"), "left_semi")
          .agg(count(lit(1)).as("n_overlap"))
        nT.crossJoin(nF).crossJoin(nO)
          .select(col("n_true"), col("n_found"), col("n_overlap"),
            round(col("n_overlap").cast("double") /
              greatest(col("n_true"), lit(1)), 6).as("recall"),
            round(col("n_overlap").cast("double") /
              greatest(col("n_found"), lit(1)), 6).as("precision"))
      },
      Some(
        s"""WITH found AS (
           |  SELECT a_id, b_id FROM ($minhashSql)
           |  WHERE a_id < 150 AND b_id < 150
           |), cleaned AS (
           |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
           |  WHERE doc_id < 150
           |), tk AS (
           |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
           |), sets AS (
           |  SELECT doc_id, list_distinct($shingleSqlExpr) AS st
           |  FROM tk
           |), jp AS (
           |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           |    len(list_filter(a.st, x -> list_contains(b.st, x))) AS inter,
           |    len(a.st) AS la, len(b.st) AS lb
           |  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
           |), truth AS (
           |  SELECT a_id, b_id FROM jp
           |  WHERE CAST(inter AS DOUBLE) / greatest(la + lb - inter, 1) >= 0.5
           |), c AS (
           |  SELECT (SELECT count(*) FROM truth) AS n_true,
           |    (SELECT count(*) FROM found) AS n_found,
           |    (SELECT count(*) FROM truth JOIN found USING (a_id, b_id))
           |      AS n_overlap
           |)
           |SELECT n_true, n_found, n_overlap,
           |  round(CAST(n_overlap AS DOUBLE) / greatest(n_true, 1), 6)
           |    AS recall,
           |  round(CAST(n_overlap AS DOUBLE) / greatest(n_found, 1), 6)
           |    AS precision
           |FROM c""".stripMargin)),

    // MinHash ESTIMATOR calibration — recall/precision above score the
    // detector's decisions; this scores the SKETCH itself: per exact-
    // Jaccard decile, how far is the 16-hash agreement estimate
    // (agree/16, the unbiased MinHash estimator) from the true Jaccard?
    // The report a pipeline reads before trusting banding thresholds at
    // a new corpus, and the empirical face of the estimator's
    // Var = J(1-J)/k bound. All arithmetic is integer micro-units
    // (estimates are multiples of 62500 = 1e6/16; exact Jaccard and
    // means are integer cross-multiplied floor divisions) — no float
    // leaves either engine. Runs on the bounded eval block (doc_id <
    // 150, the exactTruthPairs convention): all-pairs exactness is the
    // point of a calibration sample, and at 100 TB this runs on the
    // same fixed-size audit block, never the corpus.
    Q(
      "dedup_minhash_calibration",
      (s, d) => {
        val sigs = toks(s, d).filter(col("doc_id") < 150)
          .withColumn("mh",
            graft.functions.MinHashShingleSig.column(col("tok")))
          .withColumn("st", array_sort(array_distinct(shingleCol)))
          .select(col("doc_id"), col("mh"), col("st"))
        val a = sigs.select(col("doc_id").as("a_id"), col("mh").as("ma"),
          col("st").as("sa"))
        val b = sigs.select(col("doc_id").as("b_id"), col("mh").as("mb"),
          col("st").as("sb"))
        a.join(b, col("a_id") < col("b_id"))
          .withColumn("inter",
            graft.functions.SortedIntersectSize.column(
              col("sa"), col("sb")).cast("long"))
          .withColumn("un",
            greatest(size(col("sa")).cast("long") + size(col("sb"))
              - col("inter"), lit(1L)))
          .withColumn("agree", expr(
            "aggregate(zip_with(ma, mb, (x, y) -> " +
              "CASE WHEN x = y THEN 1 ELSE 0 END), 0, " +
              "(acc, e) -> acc + e)").cast("long"))
          .withColumn("est_micro", col("agree") * lit(62500L))
          .withColumn("exact_micro", expr("(inter * 1000000) div un"))
          .groupBy(expr("(inter * 10) div un").as("bucket"))
          .agg(count(lit(1)).as("n_pairs"),
            expr("sum(est_micro) div count(1)").as("mean_est_micro"),
            expr("sum(exact_micro) div count(1)").as("mean_exact_micro"),
            expr("sum(abs(est_micro - exact_micro)) div count(1)")
              .as("mean_abs_err_micro"))
          .orderBy("bucket")
      },
      Some {
        val calHashes = (0 until NumHashes).map(i =>
          s"list_aggregate(list_transform(sv, v -> (v * ${aCoef(i)} + " +
            s"${bCoef(i)}) % $P), 'min') AS h$i").mkString(",\n    ")
        val agreeSql = (0 until NumHashes).map(i =>
          s"(CASE WHEN ha.h$i = hb.h$i THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH bcl AS (
           |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
           |  WHERE doc_id < 150
           |), btk AS (
           |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM bcl
           |), bsh AS (
           |  SELECT doc_id, $shingleSqlExpr AS sh FROM btk
           |), bsv AS (
           |  SELECT doc_id,
           |    list_transform(sh, s ->
           |      ${duckHexToLong("substr(md5(s), 1, 12)")} % $P) AS sv
           |  FROM bsh
           |), bmh AS (
           |  SELECT doc_id,
           |    $calHashes
           |  FROM bsv
           |), bst AS (
           |  SELECT doc_id, list_distinct(sh) AS st FROM bsh
           |), prx AS (
           |  SELECT sa.doc_id AS a_id, sb.doc_id AS b_id,
           |    CAST(len(list_filter(sa.st, x -> list_contains(sb.st, x)))
           |      AS BIGINT) AS inter,
           |    CAST(len(sa.st) AS BIGINT) AS la,
           |    CAST(len(sb.st) AS BIGINT) AS lb,
           |    CAST($agreeSql AS BIGINT) AS agree
           |  FROM bst sa JOIN bst sb ON sa.doc_id < sb.doc_id
           |  JOIN bmh ha ON ha.doc_id = sa.doc_id
           |  JOIN bmh hb ON hb.doc_id = sb.doc_id
           |), pr AS (
           |  SELECT inter, greatest(la + lb - inter, 1) AS un,
           |    agree * 62500 AS est_micro,
           |    (inter * 1000000) // greatest(la + lb - inter, 1)
           |      AS exact_micro
           |  FROM prx
           |)
           |SELECT CAST((inter * 10) // un AS BIGINT) AS bucket,
           |  CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(sum(est_micro) // count(*) AS BIGINT) AS mean_est_micro,
           |  CAST(sum(exact_micro) // count(*) AS BIGINT)
           |    AS mean_exact_micro,
           |  CAST(sum(abs(est_micro - exact_micro)) // count(*) AS BIGINT)
           |    AS mean_abs_err_micro
           |FROM pr GROUP BY 1 ORDER BY bucket""".stripMargin
      }),

    // B-CUBED cluster evaluation (Bagga & Baldwin '98; the standard
    // extrinsic clustering metric alongside pair F1) of each detector's
    // duplicate CLUSTERS against the exact-Jaccard ground truth on the
    // eval block — dedup_minhash_recall / dedup_winnow_recall score the
    // PAIR detectors; this scores the cluster RESOLUTION the pipeline
    // actually acts on (B³ punishes over-merging chains that pair
    // recall cannot see: a-b and b-c found but not a-c still false-
    // merges a 3-cluster). One row per detector: minhash (Jaccard-
    // verified pairs, expected near-perfect) and winnow (UNVERIFIED
    // shared-fingerprint candidates, where over-merge shows up — the
    // informative row). All three clusterings are connected components
    // over block-restricted pair sets — Spark runs the distributed CC
    // operator on each bounded graph; the oracle mirrors it with
    // recursive-CTE transitive closure keyed by detector. Per element
    // e: P(e) = |C(e) ∩ T(e)|/|C(e)|, R(e) likewise over T(e);
    // averaged. EXACTNESS: every ratio is integer floor-division at
    // 1e6 scale (`div` / `//`, identical truncation cross-engine for
    // these positive operands) — integer end-to-end, the suite's
    // micro-unit convention.
    Q(
      "dedup_cc_bcubed",
      (s, d) => {
        val block = Tables.t(s, d, "documents")
          .filter(col("doc_id") < 150).select("doc_id")
        def blockPairs(pairs: DataFrame): DataFrame = pairs
          .filter(col("a_id") < 150 && col("b_id") < 150)
          .select("a_id", "b_id")
        // ONE CC invocation labels all three clusterings: the graphs
        // are made disjoint by id-space offsets (block ids < 150, so
        // 2e9 strides can never collide), unioned, and labeled
        // together — components never span offsets, and the min-member
        // label is offset-consistent, so subtracting the offset
        // recovers each graph's own labels. Three separate runs cost
        // 3x the fixed per-round action latency for identical output.
        val Off = 2000000000L
        def shift(pairs: DataFrame, o: Long): DataFrame = pairs
          .select((col("a_id") + o).as("a_id"), (col("b_id") + o).as("b_id"))
        // coalesce(1): the union graph is provably block-bounded
        // (<= 3 x 150 nodes), but its three persisted parents carry
        // ~130 cached partitions between them — without the coalesce
        // the CC build's map side schedules one task per parent
        // partition (130 tasks for a few hundred rows; the round-9
        // stage profile measured 3.6 s of summed per-task fixed cost)
        val labs = graft.operators.ConnectedComponents.run(
          shift(exactTruthPairs(s, d), 0L)
            .unionByName(shift(blockPairs(minhashPairs(s, d)), Off))
            .unionByName(shift(blockPairs(winnowPairs(s, d)), 2 * Off))
            .coalesce(1))
        // every frame below is bounded by the 150-doc eval block (labs
        // <= 3 x 150 rows), so the whole label/score cascade runs on
        // BROADCAST joins — without the hints each tiny join costs a
        // 32-partition exchange round-trip, and the ~25 stage barriers
        // were the bulk of the query's 3.2 s fully-warm wall (the CC
        // loop itself converges in one round here)
        def labels(o: Long, out: String): DataFrame =
          block.join(broadcast(
            labs.filter(col("id") >= o && col("id") < o + Off)
              .select((col("id") - o).as("doc_id"),
                (col("cluster_id") - o).as(out))),
            Seq("doc_id"), "left_outer")
            .select(col("doc_id"),
              coalesce(col(out), col("doc_id")).as(out))
        // tlabels is referenced by both detector scorecards and e by
        // four aggregates below; Catalyst replicates (does NOT dedupe)
        // repeated plan-subtree references — unpersisted, the bounded
        // 150-row block scan + label join ran 16x per query (the
        // round-8 5x-ghost lesson, re-found by the round-9 in-bench
        // stage profile). Both frames are block-bounded.
        val tlabels = graft.CacheRegistry.track(s, labels(0L, "tl"))
        def b3(predOff: Long, detector: String): DataFrame = {
          val e = graft.CacheRegistry.track(s,
            tlabels.join(broadcast(labels(predOff, "pl")), "doc_id"))
          val pc = e.groupBy("pl").agg(count(lit(1)).as("pc"))
          val tc = e.groupBy("tl").agg(count(lit(1)).as("tc"))
          val ic = e.groupBy("pl", "tl").agg(count(lit(1)).as("ic"))
          e.join(broadcast(ic), Seq("pl", "tl"))
            .join(broadcast(pc), "pl").join(broadcast(tc), "tl")
            .select(expr("(ic * 1000000) div pc").as("pmu"),
              expr("(ic * 1000000) div tc").as("rmu"))
            .agg(count(lit(1)).as("n_docs"),
              expr("coalesce(sum(pmu), 0) div greatest(count(1), 1)")
                .as("p_micro"),
              expr("coalesce(sum(rmu), 0) div greatest(count(1), 1)")
                .as("r_micro"))
            .select(lit(detector).as("detector"), col("n_docs"),
              col("p_micro").as("b3_precision_micro"),
              col("r_micro").as("b3_recall_micro"),
              expr("(2 * p_micro * r_micro) " +
                "div greatest(p_micro + r_micro, 1)").as("b3_f1_micro"))
        }
        b3(Off, "minhash")
          .unionByName(b3(2 * Off, "winnow"))
          .orderBy("detector")
      },
      Some(
        // winnowPairsCteSql carries the whole winnow lineage as a WITH
        // chain; the closure CTEs below need RECURSIVE on that WITH.
        // Truth CTEs are b-prefixed: the winnow chain already owns the
        // `cleaned`/`toksrc` names (corpus-wide, no block filter).
        winnowPairsCteSql.replaceFirst("WITH ", "WITH RECURSIVE ") +
          s""", blk AS (
           |  SELECT doc_id FROM documents WHERE doc_id < 150
           |), bcleaned AS (
           |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
           |  WHERE doc_id < 150
           |), btk AS (
           |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM bcleaned
           |), bsets AS (
           |  SELECT doc_id, list_distinct($shingleSqlExpr) AS st FROM btk
           |), bjp AS (
           |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           |    len(list_filter(a.st, x -> list_contains(b.st, x))) AS inter,
           |    len(a.st) AS la, len(b.st) AS lb
           |  FROM bsets a JOIN bsets b ON a.doc_id < b.doc_id
           |), truthp AS (
           |  SELECT a_id, b_id FROM bjp
           |  WHERE CAST(inter AS DOUBLE) / greatest(la + lb - inter, 1) >= 0.5
           |), predp AS (
           |  SELECT 'minhash' AS det, a_id, b_id FROM ($minhashSql)
           |  WHERE a_id < 150 AND b_id < 150
           |  UNION ALL
           |  SELECT 'winnow' AS det, a_id, b_id FROM wpairs
           |  WHERE a_id < 150 AND b_id < 150
           |), tsym AS (
           |  SELECT a_id AS a, b_id AS b FROM truthp
           |  UNION SELECT b_id, a_id FROM truthp
           |), treach AS (
           |  SELECT a, b FROM tsym
           |  UNION SELECT r.a, s.b FROM treach r JOIN tsym s ON r.b = s.a
           |), tlab AS (
           |  SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id))
           |    AS tl
           |  FROM blk d LEFT JOIN treach r ON r.a = d.doc_id
           |  GROUP BY d.doc_id
           |), psym AS (
           |  SELECT det, a_id AS a, b_id AS b FROM predp
           |  UNION SELECT det, b_id, a_id FROM predp
           |), preach AS (
           |  SELECT det, a, b FROM psym
           |  UNION SELECT r.det, r.a, s.b FROM preach r
           |    JOIN psym s ON r.det = s.det AND r.b = s.a
           |), plab AS (
           |  SELECT dd.det, d.doc_id,
           |    least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS pl
           |  FROM blk d CROSS JOIN (SELECT DISTINCT det FROM
           |    (VALUES ('minhash'), ('winnow')) v(det)) dd
           |  LEFT JOIN preach r ON r.det = dd.det AND r.a = d.doc_id
           |  GROUP BY dd.det, d.doc_id
           |), b3_e AS (
           |  SELECT p.det, p.doc_id, p.pl, t.tl
           |  FROM plab p JOIN tlab t USING (doc_id)
           |), b3_pc AS (SELECT det, pl, count(*) AS b3_pc FROM b3_e GROUP BY 1, 2
           |), b3_tc AS (SELECT det, tl, count(*) AS b3_tc FROM b3_e GROUP BY 1, 2
           |), b3_ic AS (
           |  SELECT det, pl, tl, count(*) AS b3_ic FROM b3_e GROUP BY 1, 2, 3
           |), b3_per AS (
           |  SELECT b3_e.det, (b3_ic.b3_ic * 1000000) // b3_pc.b3_pc AS pmu,
           |    (b3_ic.b3_ic * 1000000) // b3_tc.b3_tc AS rmu
           |  FROM b3_e JOIN b3_ic USING (det, pl, tl) JOIN b3_pc USING (det, pl)
           |    JOIN b3_tc USING (det, tl)
           |), b3_agg AS (
           |  SELECT det, count(*) AS n_docs,
           |    coalesce(sum(pmu), 0) // greatest(count(*), 1) AS p_micro,
           |    coalesce(sum(rmu), 0) // greatest(count(*), 1) AS r_micro
           |  FROM b3_per GROUP BY det
           |)
           |SELECT det AS detector, CAST(n_docs AS BIGINT) AS n_docs,
           |  CAST(p_micro AS BIGINT) AS b3_precision_micro,
           |  CAST(r_micro AS BIGINT) AS b3_recall_micro,
           |  CAST((2 * p_micro * r_micro)
           |    // greatest(p_micro + r_micro, 1) AS BIGINT) AS b3_f1_micro
           |FROM b3_agg ORDER BY detector""".stripMargin)),

    // Dedup impact report: the one-row summary a curation run emits
    // before committing a dedup pass — corpus size, docs caught in
    // duplicate clusters, docs/chars that a keep-lowest-id resolution
    // would drop. (Keep-lowest-id here, NOT the content-richness policy
    // of dedup_cc_canonical: the report costs one window over the
    // bounded label set and needs no token counts.) Shape: the memoized
    // cc labels are cluster-members only (bounded), so every aggregate
    // runs over small frames except the two corpus-wide totals, which
    // are one partial-agg'd scan.
    Q(
      "dedup_savings_report",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id")
        val labels = ccLabels(s, d)
          .select(col("id").as("doc_id"), col("cluster_id"))
        val docs = Tables.t(s, d, "documents").select("doc_id", "n_chars")
        val rm = labels
          .join(docs, "doc_id")
          .withColumn("keep_id", min(col("doc_id")).over(w))
          .filter(col("doc_id") =!= col("keep_id"))
        val tot = docs.agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars_total"))
        val dup = labels.agg(count(lit(1)).as("docs_in_clusters"))
        val rem = rm.agg(count(lit(1)).as("docs_removable"),
          coalesce(sum(col("n_chars")), lit(0L)).as("chars_removable"))
        tot.crossJoin(dup).crossJoin(rem)
      },
      Some(
        s"""WITH RECURSIVE $ccCompCte, mem AS (
           |  SELECT c.doc_id, c.cluster_id, d.n_chars
           |  FROM comp c JOIN documents d USING (doc_id)
           |), rm AS (
           |  SELECT doc_id, n_chars FROM (
           |    SELECT doc_id, n_chars,
           |      min(doc_id) OVER (PARTITION BY cluster_id) AS keep_id
           |    FROM mem)
           |  WHERE doc_id <> keep_id
           |)
           |SELECT (SELECT count(*) FROM documents) AS n_docs,
           |  (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents)
           |    AS chars_total,
           |  (SELECT count(*) FROM comp) AS docs_in_clusters,
           |  (SELECT count(*) FROM rm) AS docs_removable,
           |  (SELECT CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM rm)
           |    AS chars_removable""".stripMargin))
    ,

    // DUP-CLUSTER SIZE HISTOGRAM — the degree profile of the duplicate
    // graph: per power-of-two size band (dyadic bin-length bucket),
    // how many clusters and how many member docs. The number that
    // distinguishes a healthy corpus (mass in the 2–3 band) from one
    // with a boilerplate MEGA-cluster (a populated high band — the
    // workload that quadratic pair expansion dies on and the star-edge
    // representation exists for). dedup_cc_clusters lists the clusters
    // themselves (corpus-sized at 100 TB); this is its bounded
    // ≤64-row summary — the dashboard number. Same memoized ccLabels
    // lineage; one cluster-keyed count, one bucket rollup.
    Q(
      "dedup_cluster_size_hist",
      (s, d) =>
        ccLabels(s, d)
          .groupBy("cluster_id").agg(count(lit(1)).as("n"))
          .withColumn("bucket", (length(bin(col("n"))) - 1).cast("int"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("n")).cast("long").as("n_docs"))
          .orderBy("bucket"),
      Some(
        s"""WITH RECURSIVE $ccCompCte, sz AS (
           |  SELECT cluster_id, count(*) AS n FROM comp GROUP BY 1
           |)
           |SELECT CAST(length(bin(n)) - 1 AS INT) AS bucket,
           |  count(*) AS n_clusters, CAST(sum(n) AS BIGINT) AS n_docs
           |FROM sz GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // DEDUP IMPACT BY SOURCE — which feed loses the most content to
    // near-dup canonicalization (the follow-up question
    // dedup_savings_report's corpus totals raise, and the other half
    // of dedup_source_matrix's who-mirrors-whom view): per source, the
    // docs and chars that a keep-lowest-id policy removes. Reads the
    // SAME memoized ccLabels lineage as the report and the cluster
    // queries — the per-source decomposition can never disagree with
    // the corpus totals. One window over cluster members (cluster-
    // bounded), one broadcast-joinable removed-id set, one
    // partial-agg'd group-by; |sources| output rows.
    Q(
      "dedup_removed_by_source",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id")
        val rm = ccLabels(s, d)
          .select(col("id").as("doc_id"), col("cluster_id"))
          .withColumn("keep_id", min(col("doc_id")).over(w))
          .filter(col("doc_id") =!= col("keep_id"))
          .select(col("doc_id"), lit(1L).as("removed"))
        Tables.t(s, d, "documents")
          .select(col("doc_id"),
            coalesce(col("source"), lit("")).as("source"),
            col("n_chars"))
          .join(rm, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("removed")), lit(0L)).cast("long")
              .as("n_removed"),
            coalesce(sum(when(col("removed").isNotNull,
              col("n_chars"))), lit(0L)).cast("long")
              .as("chars_removed"))
          .select(col("source"), col("n_docs"), col("n_removed"),
            col("chars_removed"),
            round(col("n_removed").cast("double") / col("n_docs"), 6)
              .as("removed_ratio"))
          .orderBy("source")
      },
      Some(
        s"""WITH RECURSIVE $ccCompCte, rm AS (
           |  SELECT doc_id FROM (
           |    SELECT doc_id,
           |      min(doc_id) OVER (PARTITION BY cluster_id) AS keep_id
           |    FROM comp)
           |  WHERE doc_id <> keep_id
           |)
           |SELECT coalesce(d.source, '') AS source,
           |  count(*) AS n_docs,
           |  CAST(coalesce(sum(CASE WHEN rm.doc_id IS NOT NULL
           |    THEN 1 END), 0) AS BIGINT) AS n_removed,
           |  CAST(coalesce(sum(CASE WHEN rm.doc_id IS NOT NULL
           |    THEN d.n_chars END), 0) AS BIGINT) AS chars_removed,
           |  round(CAST(coalesce(sum(CASE WHEN rm.doc_id IS NOT NULL
           |    THEN 1 END), 0) AS DOUBLE) / count(*), 6)
           |    AS removed_ratio
           |FROM documents d LEFT JOIN rm USING (doc_id)
           |GROUP BY 1 ORDER BY source""".stripMargin)),

    // Fuzzy (edit-distance) near-dup pairs — the character-level
    // complement of the token-level MinHash/SimHash channels: catches
    // small in-place edits (typo fixes, byline swaps) that keep most
    // shingles but matter to a dedup policy keyed on "same article,
    // minor revision". Classic blocking-key design: candidates must
    // share the first-32-char prefix (duplicate-by-revision corpora
    // overwhelmingly preserve the head), so candidate volume is
    // sum(block²) over prefix blocks, never corpus². Two scale guards:
    // blocks are capped at 64 members (the MaxBucket pattern —
    // an adversarial constant prefix cannot go quadratic), and
    // levenshtein — O(len²) per pair, the expensive verify — runs on
    // the first 160 chars of only the surviving candidate pairs.
    // Spark and DuckDB both implement unit-cost Levenshtein, so the
    // distance itself is oracle-exact.
    Q(
      "dedup_fuzzy_pairs",
      (s, d) => {
        val k = Tables.t(s, d, "documents")
          .select(col("doc_id"),
            substring(coalesce(col("text"), lit("")), 1, 32).as("p"),
            substring(coalesce(col("text"), lit("")), 1, 160).as("head"))
        val capped = k
          .withColumn("bn",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy("p")))
          .filter(col("bn") <= 64)
        val a = capped.select(col("doc_id").as("a_id"), col("p"),
          col("head").as("a_head"))
        val b = capped.select(col("doc_id").as("b_id"), col("p"),
          col("head").as("b_head"))
        a.join(b, Seq("p"))
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
            levenshtein(col("a_head"), col("b_head")).as("lev"))
          .filter(col("lev") <= 8)
          .withColumn("exact_head", col("lev") === 0)
          .orderBy("a_id", "b_id")
      },
      Some(
        """WITH k AS (
          |  SELECT doc_id,
          |    substr(coalesce(text, ''), 1, 32) AS p,
          |    substr(coalesce(text, ''), 1, 160) AS head
          |  FROM documents
          |), capped AS (
          |  SELECT * FROM (
          |    SELECT doc_id, p, head,
          |      count(*) OVER (PARTITION BY p) AS bn
          |    FROM k)
          |  WHERE bn <= 64
          |)
          |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          |  CAST(levenshtein(a.head, b.head) AS INT) AS lev,
          |  levenshtein(a.head, b.head) = 0 AS exact_head
          |FROM capped a JOIN capped b
          |  ON a.p = b.p AND a.doc_id < b.doc_id
          |WHERE levenshtein(a.head, b.head) <= 8
          |ORDER BY a_id, b_id""".stripMargin)),

    // Passage-level keep-first dedup REWRITE (the granularity between
    // dedup_exact_stats' whole-doc hashing and dedup_substring_windows'
    // rolling detection windows): the corpus is cut into NON-overlapping
    // 32-token passages, each passage digest survives only at its first
    // occurrence in (doc_id, pos) order, and the per-doc report says
    // how many passages the rewrite would keep vs drop — the
    // paragraph-dedup mode of Lee et al. ACL'22, which rewrites
    // documents instead of dropping them. Non-overlap is what makes it
    // a REWRITE plan: dropped passages partition cleanly, no
    // overlapping-span resolution needed. Scale shape: the explode
    // carries n_tokens/32 rows (corpus-linear, 12x fewer than the
    // rolling-window explode), one digest-keyed shuffle ranks
    // first-occurrence (bucket size = digest multiplicity, never
    // corpus-sized), one doc rollup — no pair stage anywhere.
    Q(
      "dedup_passage_rewrite",
      (s, d) => {
        val P = 32
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("ph1", "ph2").orderBy("doc_id", "pos")
        toks(s, d)
          .filter(size(col("tok")) >= 1)
          .select(col("doc_id"),
            posexplode(transform(
              sequence(lit(0),
                floor((size(col("tok")) - lit(1)) / lit(P)).cast("int")),
              i => struct(
                xxhash64(slice(col("tok"), i * P + 1, lit(P))).as("ph1"),
                winKey2(slice(col("tok"), i * P + 1, lit(P))).as("ph2"))))
              .as(Seq("pos", "p")))
          .select(col("doc_id"), col("pos"),
            col("p.ph1").as("ph1"), col("p.ph2").as("ph2"))
          .withColumn("rn", row_number().over(w))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_pass"),
            count(when(col("rn") > 1, 1)).as("n_dropped"))
          .select(col("doc_id"), col("n_pass"),
            (col("n_pass") - col("n_dropped")).as("n_kept"),
            col("n_dropped"),
            round(col("n_dropped").cast("double") / col("n_pass"), 6)
              .as("drop_ratio"))
          .filter(col("n_dropped") > 0)
          .orderBy("doc_id")
      },
      Some(
        s"""WITH cleaned AS (
           |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
           |), toksrc AS (
           |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
           |), pass AS (
           |  SELECT doc_id, CAST(i AS INT) AS pos,
           |    md5(array_to_string(list_slice(tok,
           |      CAST(i AS INT) * 32 + 1, CAST(i AS INT) * 32 + 32), ' '))
           |      AS ph
           |  FROM (SELECT doc_id, tok,
           |          unnest(range(0, (len(tok) - 1) // 32 + 1)) AS i
           |        FROM toksrc WHERE len(tok) >= 1)
           |), ranked AS (
           |  SELECT doc_id, ph,
           |    row_number() OVER (PARTITION BY ph ORDER BY doc_id, pos)
           |      AS rn
           |  FROM pass
           |)
           |SELECT doc_id, count(*) AS n_pass,
           |  count(*) - count(CASE WHEN rn > 1 THEN 1 END) AS n_kept,
           |  count(CASE WHEN rn > 1 THEN 1 END) AS n_dropped,
           |  round(CAST(count(CASE WHEN rn > 1 THEN 1 END) AS DOUBLE)
           |    / count(*), 6) AS drop_ratio
           |FROM ranked GROUP BY doc_id
           |HAVING count(CASE WHEN rn > 1 THEN 1 END) > 0
           |ORDER BY doc_id""".stripMargin)),

    // Passage-level FREQUENCY-THRESHOLD drop — the C4 rule (Raffel et
    // al., JMLR'20 §2.2 dropped any line occurring >= 3 times in the
    // corpus), the complement of dedup_passage_rewrite's keep-first
    // rank: here EVERY copy of a passage whose corpus frequency
    // reaches 3 is dropped, including the first — boilerplate
    // (headers, license blocks, navigation chrome) is assumed
    // worthless in any document, whereas keep-first assumes one copy
    // is legitimate. Same non-overlapping 32-token passage lineage;
    // the rank window becomes a per-digest count window (partition
    // size = digest multiplicity, never corpus-sized), so the two
    // rules price identically and differ ONLY in the drop predicate —
    // the side-by-side a corpus team reads when choosing the rule.
    Q(
      "dedup_passage_threshold",
      (s, d) => {
        val P = 32
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("ph1", "ph2")
        toks(s, d)
          .filter(size(col("tok")) >= 1)
          .select(col("doc_id"),
            posexplode(transform(
              sequence(lit(0),
                floor((size(col("tok")) - lit(1)) / lit(P)).cast("int")),
              i => struct(
                xxhash64(slice(col("tok"), i * P + 1, lit(P))).as("ph1"),
                winKey2(slice(col("tok"), i * P + 1, lit(P))).as("ph2"))))
              .as(Seq("pos", "p")))
          .select(col("doc_id"), col("pos"),
            col("p.ph1").as("ph1"), col("p.ph2").as("ph2"))
          .withColumn("cnt", count(lit(1)).over(w))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_pass"),
            count(when(col("cnt") >= 3, 1)).as("n_dropped"))
          .select(col("doc_id"), col("n_pass"),
            (col("n_pass") - col("n_dropped")).as("n_kept"),
            col("n_dropped"),
            round(col("n_dropped").cast("double") / col("n_pass"), 6)
              .as("drop_ratio"))
          .filter(col("n_dropped") > 0)
          .orderBy("doc_id")
      },
      Some(
        s"""WITH cleaned AS (
           |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
           |), toksrc AS (
           |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
           |), pass AS (
           |  SELECT doc_id, CAST(i AS INT) AS pos,
           |    md5(array_to_string(list_slice(tok,
           |      CAST(i AS INT) * 32 + 1, CAST(i AS INT) * 32 + 32), ' '))
           |      AS ph
           |  FROM (SELECT doc_id, tok,
           |          unnest(range(0, (len(tok) - 1) // 32 + 1)) AS i
           |        FROM toksrc WHERE len(tok) >= 1)
           |), counted AS (
           |  SELECT doc_id, ph, count(*) OVER (PARTITION BY ph) AS cnt
           |  FROM pass
           |)
           |SELECT doc_id, count(*) AS n_pass,
           |  count(*) - count(CASE WHEN cnt >= 3 THEN 1 END) AS n_kept,
           |  count(CASE WHEN cnt >= 3 THEN 1 END) AS n_dropped,
           |  round(CAST(count(CASE WHEN cnt >= 3 THEN 1 END) AS DOUBLE)
           |    / count(*), 6) AS drop_ratio
           |FROM counted GROUP BY doc_id
           |HAVING count(CASE WHEN cnt >= 3 THEN 1 END) > 0
           |ORDER BY doc_id""".stripMargin)),

    // Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    // SIGMOD'03 — the MOSS algorithm): slide a w-gram window over the
    // doc's k-gram hash sequence and keep the RIGHTMOST MINIMUM of each
    // window. Unlike mod-p sampling, winnowing gives a worst-case
    // guarantee — any shared substring of >= w+k-1 tokens yields a
    // shared fingerprint — and a density bound: each selected
    // fingerprint covers at most w windows, so
    // n_windows/w <= n_fp <= n_windows (emitted as `bound_ok`, an
    // integer cross-multiplied check). The rightmost-min tie-break is
    // encoded IN the ordering key: min over md5hex || '#' ||
    // lpad(1e6 - pos) picks the smallest hash first, then (because the
    // suffix inverts position) the largest position — one string min,
    // bit-identical on both engines, no stateful scan. Scale shape:
    // the k-gram explode is corpus-linear, BOTH window functions
    // (frame min + per-doc gram count) partition by doc_id and reuse
    // ONE doc_id exchange — no global window, no self-join, partitions
    // bounded by document length. Short docs (< k tokens) fall back to
    // a single whole-text gram so every doc reports a row (the
    // shingleCol coalesce convention).
    Q(
      "dedup_winnow_fingerprints",
      (s, d) =>
        winnowSel(s, d)
          .groupBy("doc_id")
          .agg(max(col("g_cnt")).as("n_grams"),
            max(col("n_win")).as("n_windows"),
            count(lit(1)).as("n_fp"),
            min(col("sel_h")).as("fp_checksum"))
          .select(col("doc_id"), col("n_grams"), col("n_windows"),
            col("n_fp"),
            (col("n_fp") * WinnowW >= col("n_windows") &&
              col("n_fp") <= col("n_windows")).as("bound_ok"),
            col("fp_checksum"))
          .orderBy("doc_id"),
      Some(
        s"""$winnowCteSql
           |SELECT doc_id, CAST(max(g_cnt) AS BIGINT) AS n_grams,
           |  CAST(max(n_win) AS BIGINT) AS n_windows,
           |  CAST(count(*) AS BIGINT) AS n_fp,
           |  (count(*) * 4 >= max(n_win) AND count(*) <= max(n_win))
           |    AS bound_ok,
           |  min(sel_h) AS fp_checksum
           |FROM sel GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Winnowing's detection half: candidate near-dup pairs from SHARED
    // winnowed fingerprints — the consumer that turns the per-doc
    // fingerprint sample into the document-similarity index MOSS
    // serves. Requiring >= 2 shared fingerprints suppresses the
    // single-common-phrase collisions a lone shared 4-gram minimum
    // produces. Scale shape: the same banding discipline as every
    // other pair miner here — fingerprints shuffle once on sel_h, a
    // partition-count window applies the [2, MaxBucket] bucket cap
    // (an over-popular fingerprint carries no discriminating power and
    // would explode quadratically), and only capped buckets self-join,
    // so pair volume is sum(bucket^2) <= MaxBucket * |fingerprints| —
    // never corpus^2.
    Q(
      "dedup_winnow_shared_pairs",
      (s, d) => winnowPairs(s, d).orderBy("a_id", "b_id"),
      Some(
        s"""$winnowPairsCteSql
           |SELECT a_id, b_id, n_shared FROM wpairs
           |ORDER BY a_id, b_id""".stripMargin)),

    // ROUGE-1 clipped-overlap verification of the winnowed candidate
    // pairs — the unigram precision/recall scorer (Lin, ACL'04 wkshp)
    // a dedup pipeline runs over MINED candidates before acting on
    // them: overlap = Σ_t min(tf_a, tf_b) (clipped counts, the ROUGE
    // convention), and F1 = 2·overlap/(len_a+len_b) ≥ 0.5 is the
    // cross-multiplied `high_sim` verdict — counts and lengths are
    // integers, no division on either engine. Scale shape: the scorer
    // touches ONLY candidate docs — the pair set is the memoized
    // winnowPairs lineage and term frequencies come from a broadcast
    // semi-join (toksFor) over the bounded candidate id set, so the
    // corpus is never re-tokenized; the per-pair term join fans out as
    // pairs × terms-per-doc, linear in the candidate volume the
    // bucket cap already bounds.
    Q(
      "dedup_pair_rouge_overlap",
      (s, d) => {
        val pairs = winnowPairs(s, d)
        val ids = pairs.select(col("a_id").as("doc_id"))
          .union(pairs.select(col("b_id").as("doc_id"))).distinct()
        // tf is bounded (pair-member docs only) and consumed THREE
        // times below (both join sides + lens) — un-persisted, each
        // consumer re-tokenized the candidate set (r13, guide §5)
        val tf = graft.CacheRegistry.track(s, toksFor(s, d, ids)
          .select(col("doc_id"), explode(col("tok")).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("c")))
        val lens = tf.groupBy("doc_id").agg(sum(col("c")).as("len"))
        pairs
          .join(tf.select(col("doc_id").as("a_id"), col("term"),
            col("c").as("ca")), Seq("a_id"))
          .join(tf.select(col("doc_id").as("b_id"), col("term"),
            col("c").as("cb")), Seq("b_id", "term"))
          .groupBy("a_id", "b_id")
          .agg(sum(least(col("ca"), col("cb"))).as("overlap"))
          .join(lens.select(col("doc_id").as("a_id"),
            col("len").as("len_a")), Seq("a_id"))
          .join(lens.select(col("doc_id").as("b_id"),
            col("len").as("len_b")), Seq("b_id"))
          .select(col("a_id"), col("b_id"), col("overlap"),
            col("len_a"), col("len_b"),
            (col("overlap") * 4 >= col("len_a") + col("len_b"))
              .as("high_sim"))
          .orderBy("a_id", "b_id")
      },
      Some(
        s"""$winnowPairsCteSql, ids AS (
           |  SELECT a_id AS doc_id FROM wpairs
           |  UNION SELECT b_id FROM wpairs
           |), tf AS (
           |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
           |  FROM (SELECT t.doc_id, unnest(t.tok) AS term
           |        FROM toksrc t JOIN ids USING (doc_id))
           |  GROUP BY 1, 2
           |), lens AS (
           |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS len
           |  FROM tf GROUP BY 1
           |), ovl AS (
           |  SELECT p.a_id, p.b_id,
           |    CAST(sum(least(ta.c, tb.c)) AS BIGINT) AS overlap
           |  FROM wpairs p
           |  JOIN tf ta ON ta.doc_id = p.a_id
           |  JOIN tf tb ON tb.doc_id = p.b_id AND tb.term = ta.term
           |  GROUP BY 1, 2
           |)
           |SELECT o.a_id, o.b_id, o.overlap,
           |  la.len AS len_a, lb.len AS len_b,
           |  (o.overlap * 4 >= la.len + lb.len) AS high_sim
           |FROM ovl o
           |JOIN lens la ON la.doc_id = o.a_id
           |JOIN lens lb ON lb.doc_id = o.b_id
           |ORDER BY a_id, b_id""".stripMargin)),

    // Winnowing recall/precision against the SAME Jaccard >= 0.5
    // ground truth dedup_minhash_recall measures — so the two detectors
    // produce directly comparable quality rows on one truth set (the
    // cross-detector evidence that decides which miner a pipeline
    // trusts at which threshold). Truth: exact all-pairs shingle
    // Jaccard on the bounded doc_id < 150 block (the quadratic join is
    // confined there); found: the memoized winnow pair lineage cut to
    // the same block. Winnow candidates are 4-gram window minima, not
    // Jaccard-verified, so unlike the minhash row BOTH recall and
    // precision are informative here.
    Q(
      "dedup_winnow_recall",
      (s, d) => {
        val truth = exactTruthPairs(s, d)
        val found = winnowPairs(s, d)
          .filter(col("a_id") < 150 && col("b_id") < 150)
          .select("a_id", "b_id")
        val nT = truth.agg(count(lit(1)).as("n_true"))
        val nF = found.agg(count(lit(1)).as("n_found"))
        val nO = truth.join(found, Seq("a_id", "b_id"), "left_semi")
          .agg(count(lit(1)).as("n_overlap"))
        nT.crossJoin(nF).crossJoin(nO)
          .select(col("n_true"), col("n_found"), col("n_overlap"),
            round(col("n_overlap").cast("double") /
              greatest(col("n_true"), lit(1)), 6).as("recall"),
            round(col("n_overlap").cast("double") /
              greatest(col("n_found"), lit(1)), 6).as("precision"))
      },
      Some(
        s"""$winnowPairsCteSql, foundw AS (
           |  SELECT a_id, b_id FROM wpairs
           |  WHERE a_id < 150 AND b_id < 150
           |), cleaned150 AS (
           |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
           |  WHERE doc_id < 150
           |), tk150 AS (
           |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned150
           |), sets150 AS (
           |  SELECT doc_id, list_distinct($shingleSqlExpr) AS st
           |  FROM tk150
           |), jp AS (
           |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           |    len(list_filter(a.st, x -> list_contains(b.st, x))) AS inter,
           |    len(a.st) AS la, len(b.st) AS lb
           |  FROM sets150 a JOIN sets150 b ON a.doc_id < b.doc_id
           |), truth AS (
           |  SELECT a_id, b_id FROM jp
           |  WHERE CAST(inter AS DOUBLE) / greatest(la + lb - inter, 1) >= 0.5
           |), c AS (
           |  SELECT (SELECT count(*) FROM truth) AS n_true,
           |    (SELECT count(*) FROM foundw) AS n_found,
           |    (SELECT count(*) FROM truth JOIN foundw USING (a_id, b_id))
           |      AS n_overlap
           |)
           |SELECT n_true, n_found, n_overlap,
           |  round(CAST(n_overlap AS DOUBLE) / greatest(n_true, 1), 6)
           |    AS recall,
           |  round(CAST(n_overlap AS DOUBLE) / greatest(n_found, 1), 6)
           |    AS precision
           |FROM c""".stripMargin)),

    // Cross-detector agreement matrix — minhash vs winnowing found-sets
    // on the bounded doc_id < 150 block: the side-by-side an index team
    // reads before choosing which miner (or both) to trust, the direct
    // set-level complement of the two per-detector recall rows that
    // share one truth definition. Agreement is the exact Jaccard of
    // the two pair sets, emitted as the cross-multiplied
    // `majority_agree` verdict (2·|W∩M| >= |W∪M|) beside the raw
    // counts — no division. Both sides are memoized lineages
    // (minhashPairs, winnowPairs) cut to the block; the compare is a
    // full-outer join over two bounded pair sets.
    Q(
      "dedup_detector_agreement",
      (s, d) => {
        def cut(df: DataFrame, tag: String): DataFrame =
          df.filter(col("a_id") < 150 && col("b_id") < 150)
            .select(col("a_id"), col("b_id"), lit(1).as(tag))
        val m = cut(minhashPairs(s, d), "in_m")
        val w = cut(winnowPairs(s, d), "in_w")
        m.join(w, Seq("a_id", "b_id"), "full_outer")
          .agg(
            count(col("in_m")).as("n_minhash"),
            count(col("in_w")).as("n_winnow"),
            count(when(col("in_m") === 1 && col("in_w") === 1, 1))
              .as("n_both"),
            count(when(col("in_m") === 1 && col("in_w").isNull, 1))
              .as("n_only_minhash"),
            count(when(col("in_w") === 1 && col("in_m").isNull, 1))
              .as("n_only_winnow"))
          .withColumn("majority_agree",
            col("n_both") * 2 >=
              col("n_both") + col("n_only_minhash") + col("n_only_winnow"))
      },
      Some(
        s"""$winnowPairsCteSql, mh AS (
           |  SELECT a_id, b_id FROM ($minhashSql)
           |  WHERE a_id < 150 AND b_id < 150
           |), wn AS (
           |  SELECT a_id, b_id FROM wpairs
           |  WHERE a_id < 150 AND b_id < 150
           |), j AS (
           |  SELECT coalesce(mh.a_id, wn.a_id) AS a_id,
           |    (mh.a_id IS NOT NULL) AS in_m,
           |    (wn.a_id IS NOT NULL) AS in_w
           |  FROM mh FULL OUTER JOIN wn
           |    ON mh.a_id = wn.a_id AND mh.b_id = wn.b_id
           |)
           |SELECT CAST(count(CASE WHEN in_m THEN 1 END) AS BIGINT)
           |    AS n_minhash,
           |  CAST(count(CASE WHEN in_w THEN 1 END) AS BIGINT) AS n_winnow,
           |  CAST(count(CASE WHEN in_m AND in_w THEN 1 END) AS BIGINT)
           |    AS n_both,
           |  CAST(count(CASE WHEN in_m AND NOT in_w THEN 1 END) AS BIGINT)
           |    AS n_only_minhash,
           |  CAST(count(CASE WHEN in_w AND NOT in_m THEN 1 END) AS BIGINT)
           |    AS n_only_winnow,
           |  count(CASE WHEN in_m AND in_w THEN 1 END) * 2 >=
           |    count(CASE WHEN in_m OR in_w THEN 1 END) AS majority_agree
           |FROM j""".stripMargin)),

    // CROSS-SOURCE duplication matrix — the curation diagnostic that
    // tells you which feeds mirror which: for every source pair
    // (a <= b), the number of SHARED-PASSAGE pairs spanning them
    // (dedup_passage_rewrite's non-overlapping 32-token digests —
    // passage granularity because feeds rarely mirror whole documents
    // byte-identically but constantly share paragraphs, boilerplate
    // and syndicated spans; within-source pairs count same-doc repeats
    // too, which is what makes the diagonal a boilerplate meter).
    // Scale shape: NO passage-pair stage anywhere — one digest pass
    // (corpus-linear / 32), one (ph, source) count (at most |sources|
    // rows per digest, never the digest's occurrence count), then a
    // per-digest source self-join bounded by |sources|^2 and integer
    // pair arithmetic (c_a*c_b across sources, C(c,2) within one). A
    // dup-heavy corpus concentrates counts, not rows — the same reason
    // the exact-dup pre-pass exists in buildMinhashPairs.
    Q(
      "dedup_source_matrix",
      (s, d) => {
        val P = 32
        val fps = Tables.t(s, d, "documents")
          .select(col("source"),
            graft.functions.NormTokens.column(col("text")).as("tok"))
          .filter(size(col("tok")) >= 1)
          .select(col("source"),
            explode(transform(
              sequence(lit(0),
                floor((size(col("tok")) - lit(1)) / lit(P)).cast("int")),
              i => struct(
                xxhash64(slice(col("tok"), i * P + 1, lit(P))).as("fp1"),
                winKey2(slice(col("tok"), i * P + 1, lit(P))).as("fp2"))))
              .as("p"))
          .select(col("source"), col("p.fp1").as("fp1"),
            col("p.fp2").as("fp2"))
        val cnt = fps.groupBy("fp1", "fp2", "source")
          .agg(count(lit(1)).as("c"))
        val a = cnt.select(col("fp1"), col("fp2"),
          col("source").as("source_a"), col("c").as("ca"))
        val b = cnt.select(col("fp1"), col("fp2"),
          col("source").as("source_b"), col("c").as("cb"))
        a.join(b, Seq("fp1", "fp2"))
          .filter(col("source_a") <= col("source_b"))
          .select(col("source_a"), col("source_b"),
            when(col("source_a") === col("source_b"),
              expr("ca * (ca - 1) DIV 2"))
              .otherwise(col("ca") * col("cb")).as("pairs"))
          .groupBy("source_a", "source_b")
          .agg(sum(col("pairs")).as("n_dup_pairs"))
          .filter(col("n_dup_pairs") > 0)
          .orderBy(col("n_dup_pairs").desc, col("source_a"),
            col("source_b"))
      },
      Some(
        s"""WITH cleaned AS (
           |  SELECT doc_id, source, ${cleanSql("text")} AS text_clean
           |  FROM documents
           |), toksrc AS (
           |  SELECT doc_id, source, ${tokensSql("text_clean")} AS tok
           |  FROM cleaned
           |), fps AS (
           |  SELECT source,
           |    md5(array_to_string(list_slice(tok,
           |      CAST(i AS INT) * 32 + 1, CAST(i AS INT) * 32 + 32), ' '))
           |      AS fp
           |  FROM (SELECT source, tok,
           |          unnest(range(0, (len(tok) - 1) // 32 + 1)) AS i
           |        FROM toksrc WHERE len(tok) >= 1)
           |), cnt AS (
           |  SELECT fp, source, count(*) AS c FROM fps GROUP BY 1, 2
           |), pairs AS (
           |  SELECT a.source AS source_a, b.source AS source_b,
           |    CASE WHEN a.source = b.source THEN a.c * (a.c - 1) // 2
           |      ELSE a.c * b.c END AS pairs
           |  FROM cnt a JOIN cnt b
           |    ON a.fp = b.fp AND a.source <= b.source
           |)
           |SELECT source_a, source_b,
           |  CAST(sum(pairs) AS BIGINT) AS n_dup_pairs
           |FROM pairs GROUP BY 1, 2
           |HAVING sum(pairs) > 0
           |ORDER BY n_dup_pairs DESC, source_a, source_b""".stripMargin)),

    // CLUSTER-AWARE train/val/test split — the enforcement step the
    // detection queries imply: a near-dup cluster must never straddle
    // splits (a test doc with a train near-twin is leakage — the
    // failure dedup_split_contamination MEASURES; this query PREVENTS
    // it by construction). The split unit is the doc's CC cluster id
    // (its own id when unclustered), hashed with doc_hash_split_counts'
    // md5-bucket arithmetic (80/10/10). The output carries the proof:
    // n_straddle_cluster counts near-dup pairs whose ends land in
    // different splits under THIS assignment (zero by construction —
    // both ends share a unit) beside n_straddle_naive, the same count
    // under the per-doc hash split (non-zero on a dup-heavy corpus —
    // the leak this query exists to close). Scale shape: the CC labels
    // and pair set are the shared persisted lineage; on top of them
    // one left join, one md5 per doc, two broadcast pair joins.
    Q(
      "dedup_cluster_split",
      (s, d) => {
        val labels = ccLabels(s, d)
          .select(col("id").as("doc_id"), col("cluster_id"))
        val units = Tables.t(s, d, "documents").select("doc_id")
          .join(labels, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster_id"), col("doc_id")).as("unit"))
        def bucket(c: String): Column =
          expr(s"conv(substring(md5(cast($c AS string)), 1, 4), 16, 10)")
            .cast("long") % 100
        def splitOf(c: String): Column =
          when(bucket(c) < 80, "train").when(bucket(c) < 90, "val")
            .otherwise("test")
        // no persist: asg is consumed three times but is one md5-cheap
        // projection over the doc-id scan — recompute beats holding
        // suite-lifetime cache
        val asg = units
          .select(col("doc_id"), col("unit"),
            splitOf("unit").as("split"),
            splitOf("doc_id").as("naive_split"))
        val counts = asg.groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("unit")).as("n_units"))
        val pr = minhashPairs(s, d).select("a_id", "b_id")
        def straddle(side: String): Column =
          coalesce(sum(when(col(s"a_$side") =!= col(s"b_$side"), 1L)),
            lit(0L))
        val str = pr
          .join(asg.select(col("doc_id").as("a_id"),
            col("split").as("a_split"),
            col("naive_split").as("a_naive")), "a_id")
          .join(asg.select(col("doc_id").as("b_id"),
            col("split").as("b_split"),
            col("naive_split").as("b_naive")), "b_id")
          .agg(straddle("split").as("n_straddle_cluster"),
            straddle("naive").as("n_straddle_naive"))
        counts.crossJoin(broadcast(str)).orderBy("split")
      },
      Some(
        s"""WITH RECURSIVE pairs AS (
           |  $minhashSql
           |), edges AS (
           |  SELECT a_id AS u, b_id AS v FROM pairs
           |  UNION
           |  SELECT b_id, a_id FROM pairs
           |), nodes AS (
           |  SELECT DISTINCT u AS id FROM edges
           |), reach(id, lab) AS (
           |  SELECT id, id FROM nodes
           |  UNION
           |  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.id
           |), comp AS (
           |  SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id
           |), units AS (
           |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS unit
           |  FROM documents d LEFT JOIN comp c USING (doc_id)
           |), asg AS (
           |  SELECT doc_id, unit,
           |    CASE
           |      WHEN CAST(('0x' || substr(md5(CAST(unit AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 80 THEN 'train'
           |      WHEN CAST(('0x' || substr(md5(CAST(unit AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 90 THEN 'val'
           |      ELSE 'test' END AS split,
           |    CASE
           |      WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 80 THEN 'train'
           |      WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 90 THEN 'val'
           |      ELSE 'test' END AS naive_split
           |  FROM units
           |), counts AS (
           |  SELECT split, count(*) AS n_docs,
           |    count(DISTINCT unit) AS n_units
           |  FROM asg GROUP BY 1
           |), str AS (
           |  SELECT
           |    CAST(coalesce(sum(CASE WHEN a.split <> b.split
           |      THEN 1 END), 0) AS BIGINT) AS n_straddle_cluster,
           |    CAST(coalesce(sum(CASE WHEN a.naive_split <> b.naive_split
           |      THEN 1 END), 0) AS BIGINT) AS n_straddle_naive
           |  FROM pairs p
           |  JOIN asg a ON a.doc_id = p.a_id
           |  JOIN asg b ON b.doc_id = p.b_id
           |)
           |SELECT c.split, c.n_docs, c.n_units,
           |  str.n_straddle_cluster, str.n_straddle_naive
           |FROM counts c CROSS JOIN str
           |ORDER BY c.split""".stripMargin))
  )

  // ---- winnowing (MOSS) shared lineage --------------------------------

  /** winnowing window width in grams (k = 4-token grams; detection
    * guarantee threshold = w + k - 1 = 7 tokens)
    */
  val WinnowW = 4

  /** Upper bound on grams-per-doc the winnow tie-break can encode: the
    * rightmost-min pick rides on lexicographic order of the fixed-width
    * 13-digit string (1e12 - pos), which only sorts correctly while the
    * value stays non-negative. 1e12 grams is ~4 TB of text in ONE
    * document — unreachable in practice — and [[buildWinnowSel]] raises
    * (rather than mis-selects) if a doc ever exceeds it. */
  val WinnowPosBound = 1000000000000L

  /** Selected winnowing fingerprints: one row per distinct
    * (doc, position, hash) rightmost-window-minimum, with the per-doc
    * gram and window counts carried alongside. THE single definition
    * shared by dedup_winnow_fingerprints (per-doc report) and
    * dedup_winnow_shared_pairs (pair mining) — [[winnowCteSql]] is its
    * oracle twin and the two must evolve together. Memoized + persisted
    * per (session, dir) like every shared produce-consume lineage here:
    * the selection is ~2/(w+1) of the gram count (corpus-linear but
    * cheap to hold), and the second consumer reuses materialized rows
    * instead of re-tokenizing the corpus.
    */
  private def winnowSel(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.memo("dedup_winnow_sel", s, d)(
      graft.CacheRegistry.track(s, buildWinnowSel(s, d)))

  private def buildWinnowSel(s: SparkSession, d: String): DataFrame = {
    val frameW = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        WinnowW - 1)
    val docW = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
    toksSpread(s, d)
      .select(col("doc_id"),
        posexplode(
          when(size(col("tok")) >= 4,
            transform(sequence(lit(1), size(col("tok")) - 3), i =>
              md5(concat_ws(" ",
                element_at(col("tok"), i),
                element_at(col("tok"), i + 1),
                element_at(col("tok"), i + 2),
                element_at(col("tok"), i + 3)))))
            .otherwise(array(
              md5(coalesce(array_join(col("tok"), " "), lit(""))))))
          .as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("h"))
      .withColumn("selk",
        min(concat(col("h"), lit("#"),
          lpad((lit(WinnowPosBound) - col("pos")).cast("string"), 13, "0")))
          .over(frameW))
      .withColumn("g_cnt", count(lit(1)).over(docW))
      // valid window starts only: the trailing w-1 positions open
      // frames that a full window already covers (clipped frames
      // would re-pick their suffix minima and break the bound)
      .filter(col("pos") <= greatest(col("g_cnt") - (WinnowW - 1), lit(1)))
      .select(col("doc_id"), col("g_cnt"),
        greatest(col("g_cnt") - (WinnowW - 1), lit(1)).as("n_win"),
        substring(col("selk"), 1, 32).as("sel_h"),
        // pos beyond the encoding bound would make (bound - pos)
        // negative and its '-'-prefixed string sort before every digit,
        // corrupting the rightmost-min pick — so over-bound docs fail
        // loudly here (once per selected row, after the ~2/(w+1) cut)
        // instead of silently selecting wrong fingerprints
        when(col("g_cnt") <= WinnowPosBound,
          lit(WinnowPosBound) -
            substring(col("selk"), 34, 13).cast("long"))
          .otherwise(raise_error(
            lit("winnow tie-break: doc exceeds 1e12 grams")).cast("long"))
          .as("sel_pos"))
      .distinct()
  }

  /** Candidate near-dup pairs sharing >= 2 winnowed fingerprints under
    * the [2, MaxBucket] bucket cap — THE single pair definition shared
    * by dedup_winnow_shared_pairs (the report) and
    * dedup_pair_rouge_overlap (the verification scorer), memoized +
    * persisted so the scorer reuses materialized pairs.
    * [[winnowPairsCteSql]] is the oracle twin.
    */
  private def winnowPairs(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.memo("dedup_winnow_pairs", s, d)(
      graft.CacheRegistry.track(s, {
        val fps = winnowSel(s, d)
          .select(col("doc_id"), col("sel_h")).distinct()
        val qf = fps
          .withColumn("bs", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("sel_h")))
          .filter(col("bs") >= 2 && col("bs") <= MaxBucket)
          .select(col("sel_h"), col("doc_id"))
        qf.select(col("sel_h"), col("doc_id").as("a_id"))
          .join(qf.select(col("sel_h"), col("doc_id").as("b_id")), "sel_h")
          .filter(col("a_id") < col("b_id"))
          .groupBy("a_id", "b_id")
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
      }))

  /** DuckDB twin of [[winnowPairs]]: extends [[winnowCteSql]] with the
    * fps/qf/wpairs CTEs (no line may start with `||` — the outer
    * stripMargin would eat a pipe, see the verify-skill gotcha)
    */
  private def winnowPairsCteSql: String =
    s"""$winnowCteSql, fps AS (
       |  SELECT DISTINCT doc_id, sel_h FROM sel
       |), qf AS (
       |  SELECT doc_id, sel_h FROM (
       |    SELECT doc_id, sel_h,
       |      count(*) OVER (PARTITION BY sel_h) AS bs FROM fps)
       |  WHERE bs BETWEEN 2 AND $MaxBucket
       |), wpairs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(count(*) AS BIGINT) AS n_shared
       |  FROM qf a JOIN qf b ON a.sel_h = b.sel_h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= 2
       |)""".stripMargin

  /** DuckDB twin of [[winnowSel]]: CTE chain ending in `sel` */
  private def winnowCteSql: String =
    s"""WITH cleaned AS (
       |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
       |), toksrc AS (
       |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
       |), g AS (
       |  SELECT doc_id,
       |    CASE WHEN len(tok) >= 4
       |    THEN list_transform(range(1, len(tok) - 2), i ->
       |      md5(concat(tok[i], ' ', tok[i+1], ' ', tok[i+2], ' ',
       |        tok[i+3])))
       |    ELSE [md5(coalesce(array_to_string(tok, ' '), ''))] END AS gr
       |  FROM toksrc
       |), e AS (
       |  SELECT doc_id, CAST(pos AS INT) AS pos,
       |    gr[CAST(pos AS INT)] AS h, len(gr) AS g_cnt
       |  FROM (SELECT doc_id, gr,
       |          unnest(range(1, len(gr) + 1)) AS pos FROM g)
       |), sel AS (
       |  SELECT DISTINCT doc_id, g_cnt,
       |    greatest(g_cnt - 3, 1) AS n_win,
       |    substr(selk, 1, 32) AS sel_h,
       |    CASE WHEN g_cnt <= 1000000000000
       |      THEN 1000000000000 - CAST(substr(selk, 34, 13) AS BIGINT)
       |      ELSE CAST(error('winnow tie-break: doc exceeds 1e12 grams')
       |        AS BIGINT) END AS sel_pos
       |  FROM (
       |    SELECT doc_id, pos, g_cnt,
       |      min(h || '#' ||
       |          lpad(CAST(1000000000000 - pos AS VARCHAR), 13, '0'))
       |        OVER (PARTITION BY doc_id ORDER BY pos
       |              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS selk
       |    FROM e)
       |  WHERE pos <= greatest(g_cnt - 3, 1)
       |)""".stripMargin
}
