package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}
import graft.functions.TextFns._
import graft.functions.Num._

/** Reference-parity query surface (SURVEY.md §2.3–2.6, §3.3) over the
  * `documents` table, which stands in for the reference's news articles
  * (FIXTURES.md §B). All sentiment math is built-in expressions (see
  * TextFns) so every query is one whole-stage-codegen span up to the
  * aggregate; the only shuffles are the final single-key hash aggs.
  */
object DocQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")

  /** Shared pipeline: project → clean (P3) → tokenize → polarity (U1) —
    * narrow, shuffle-free, codegen'd end to end.
    */
  private def scored(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("text_clean", clean(col("text")))
      // tok comes from the one-pass NormTokens kernel (== tokens(text_clean),
      // property-spec'd); text_clean stays a separate column that Catalyst
      // prunes away for the many queries consuming only tok
      .withColumn("tok", graft.functions.NormTokens.column(col("text")))
      .withColumn("polarity", polarity(col("tok")))
      .withColumn("n_tokens", size(col("tok")))

  private val cte = docPolarityCte // DuckDB twin of `scored`

  val qs: Seq[Q] = Seq(
    // Dataset-card column profile: per column, the row/non-null/distinct
    // counts and min/max — the schema-audit pass a pipeline runs before
    // training on a new drop. Long format via ONE scan + a 5-way
    // explode; the single distinct aggregate plans as a two-level agg
    // (group by (col, value), then count), NOT the multi-distinct
    // Expand that x-plodes rows — at 100 TB the wide-format
    // one-row-per-table profile with k countDistincts would Expand the
    // scan k times. String min/max compare as UTF-8 bytes, DuckDB's
    // default binary collation — portable.
    Q(
      "doc_profile",
      (s, d) => {
        val lf = docs(s, d).select(
          posexplode(array(
            struct(lit("doc_id").as("col_name"),
              col("doc_id").cast("string").as("v")),
            struct(lit("lang").as("col_name"), col("lang").as("v")),
            struct(lit("n_chars").as("col_name"),
              col("n_chars").cast("string").as("v")),
            struct(lit("source").as("col_name"), col("source").as("v")),
            struct(lit("text").as("col_name"), col("text").as("v")))))
          .select(col("col.col_name").as("col_name"), col("col.v").as("v"))
        lf.groupBy("col_name")
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("v")).as("n_nonnull"),
            countDistinct(col("v")).as("n_distinct"),
            min(col("v")).as("min_v"),
            max(col("v")).as("max_v"))
          .orderBy("col_name")
      },
      Some(
        """WITH lf AS (
          |  SELECT 'doc_id' AS col_name, CAST(doc_id AS VARCHAR) AS v FROM documents
          |  UNION ALL SELECT 'lang', lang FROM documents
          |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents
          |  UNION ALL SELECT 'source', source FROM documents
          |  UNION ALL SELECT 'text', text FROM documents
          |)
          |SELECT col_name, count(*) AS n_rows, count(v) AS n_nonnull,
          |  count(DISTINCT v) AS n_distinct, min(v) AS min_v, max(v) AS max_v
          |FROM lf GROUP BY 1 ORDER BY col_name""".stripMargin)),

    // Global-statistic-driven length filter: flag docs shorter than half
    // the corpus MEAN token count or longer than 4x the mean — the
    // length-outlier gate of a training-data pipeline, where the
    // threshold is a corpus property computed in the same job, not a
    // constant. The gate compares in cross-multiplied INTEGER form
    // (2*n_tokens*n >= sum, not n_tokens >= sum/n/2), so it is exact on
    // both engines — no float threshold for a boundary doc to straddle
    // differently. Scale shape: one partial-agg'd scan for (sum, count),
    // whose 1-row result broadcasts into the second scan's filter; the
    // corpus itself never shuffles.
    Q(
      "doc_length_filter",
      (s, d) => {
        val stats = scored(s, d).agg(
          sum(col("n_tokens")).as("s_tok"),
          count(lit(1)).as("n_docs"))
        scored(s, d).select("doc_id", "n_tokens")
          .crossJoin(broadcast(stats))
          .select(col("doc_id"), col("n_tokens"),
            (col("n_tokens") * 2 * col("n_docs") >= col("s_tok") &&
              col("n_tokens") * col("n_docs") <= col("s_tok") * 4).as("kept"))
          .orderBy("doc_id")
      },
      Some(
        s"""$cte, st AS (
           |  SELECT CAST(sum(n_tokens) AS BIGINT) AS s_tok,
           |    count(*) AS n_docs
           |  FROM scored
           |)
           |SELECT doc_id, n_tokens,
           |  (n_tokens * 2 * n_docs >= s_tok AND n_tokens * n_docs <= s_tok * 4) AS kept
           |FROM scored CROSS JOIN st
           |ORDER BY doc_id""".stripMargin)),

    // Deterministic hash split (train/val/test): bucket = first 4 md5
    // hex chars of the STABLE doc key, mod 100 -> 80/10/10. This is the
    // production answer to reproducible sampling at 100 TB — seeded
    // rand()/sampleBy is partitioning-order-dependent and not
    // cross-engine checkable; a content-key hash is stable under
    // repartition, re-runs, and engine swaps, and docs never migrate
    // between splits when the corpus grows. Narrow per-row compute +
    // one small hash agg.
    Q(
      "doc_hash_split_counts",
      (s, d) => {
        val bucket =
          expr("conv(substring(md5(cast(doc_id AS string)), 1, 4), 16, 10)")
            .cast("long") % 100
        docs(s, d)
          .withColumn("split",
            when(bucket < 80, "train").when(bucket < 90, "val")
              .otherwise("test"))
          .groupBy("split").agg(count(lit(1)).as("n"))
          .orderBy("split")
      },
      Some(
        """WITH b AS (
          |  SELECT CASE
          |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 80 THEN 'train'
          |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 90 THEN 'val'
          |    ELSE 'test' END AS split
          |  FROM documents)
          |SELECT split, count(*) AS n FROM b GROUP BY 1 ORDER BY split""".stripMargin)),

    // Deterministic stratified sampling — the data-mixing op of a
    // training pipeline: each language keeps a different fraction via
    // the same md5-bucket arithmetic as the hash split (repartition-
    // stable, re-run-stable; a doc's keep/drop never changes as the
    // corpus grows — what seeded rand()/sampleBy cannot guarantee).
    // One scan + one partial-agg'd shuffle on lang.
    Q(
      "doc_stratified_sample",
      (s, d) => {
        val rates = Seq("en" -> 30, "fr" -> 50, "es" -> 50, "de" -> 70)
        val bucket =
          expr("conv(substring(md5(cast(doc_id AS string)), 1, 4), 16, 10)")
            .cast("long") % 100
        val rate = rates.foldLeft(lit(50)) { case (acc, (l, r)) =>
          when(col("lang") === l, lit(r)).otherwise(acc)
        }
        docs(s, d)
          .withColumn("keep", bucket < rate)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_total"),
            count(when(col("keep"), 1)).as("n_sampled"))
          .orderBy("lang")
      },
      Some(
        """WITH b AS (
          |  SELECT lang,
          |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 AS bucket
          |  FROM documents)
          |SELECT lang, count(*) AS n_total,
          |  count(CASE WHEN bucket < (CASE lang WHEN 'en' THEN 30
          |    WHEN 'fr' THEN 50 WHEN 'es' THEN 50 WHEN 'de' THEN 70
          |    ELSE 50 END) THEN 1 END) AS n_sampled
          |FROM b GROUP BY 1 ORDER BY lang""".stripMargin)),

    // P1: column projection (reference streaming_pipeline.py:114–121)
    Q(
      "doc_project",
      (s, d) =>
        docs(s, d).select("doc_id", "lang", "source", "n_chars")
          .orderBy("doc_id"),
      Some("SELECT doc_id, lang, source, n_chars FROM documents ORDER BY doc_id")),

    // P3 + F1: clean then drop null/blank rows (streaming_pipeline.py:122–133;
    // the stricter pandas trim-variant of work.py:147)
    Q(
      "doc_clean_filter",
      (s, d) =>
        scored(s, d)
          .filter(col("text_clean").isNotNull && trim(col("text_clean")) =!= "")
          .select("doc_id", "text_clean")
          .orderBy("doc_id"),
      Some(
        s"""$cte SELECT doc_id, text_clean FROM scored
           |WHERE text_clean IS NOT NULL AND trim(text_clean) <> ''
           |ORDER BY doc_id""".stripMargin)),

    // C1: concat_ws combine (streaming_pipeline.py:136–139); `source`
    // plays the reference's title role
    Q(
      "doc_combined",
      (s, d) =>
        scored(s, d)
          .withColumn("combined_text",
            concat_ws(" ", clean(col("source")), col("text_clean")))
          .select("doc_id", "combined_text")
          .orderBy("doc_id"),
      Some(
        s"""$cte SELECT doc_id,
           |  concat_ws(' ', ${cleanSql("source")}, text_clean) AS combined_text
           |FROM scored ORDER BY doc_id""".stripMargin)),

    // U1 + U2 + C2: polarity, label thresholds, confidence CASE
    Q(
      "doc_sentiment",
      (s, d) =>
        scored(s, d)
          .withColumn("sentiment", label(col("polarity")))
          .withColumn("sentiment_confidence", confidence(col("polarity")))
          .select("doc_id", "polarity", "sentiment", "sentiment_confidence")
          .orderBy("doc_id"),
      Some(
        s"""$cte SELECT doc_id, polarity,
           |  ${labelSql("polarity")} AS sentiment,
           |  ${confidenceSql("polarity")} AS sentiment_confidence
           |FROM scored ORDER BY doc_id""".stripMargin)),

    // G2: group-by count over the sentiment label (streaming_pipeline.py:95)
    Q(
      "doc_sentiment_counts",
      (s, d) =>
        scored(s, d)
          .withColumn("sentiment", label(col("polarity")))
          .groupBy("sentiment").agg(count(lit(1)).as("n"))
          .orderBy("sentiment"),
      Some(
        s"""$cte SELECT ${labelSql("polarity")} AS sentiment, count(*) AS n
           |FROM scored GROUP BY 1 ORDER BY sentiment""".stripMargin)),

    // G3: per-group percentage of total (streamlit_app.py:186–210)
    Q(
      "doc_sentiment_pct",
      (s, d) =>
        scored(s, d)
          .withColumn("sentiment", label(col("polarity")))
          .groupBy("sentiment").agg(count(lit(1)).as("n"))
          // the unpartitioned window (and its "No Partition Defined"
          // warning) is deliberate AND scale-safe: its input is the
          // POST-AGGREGATION frame — one row per sentiment label, never
          // the corpus — so "all data to a single partition" means 3
          // rows. The alternative (cross-join a scalar total) would
          // re-run the scan+scoring lineage for the total.
          .withColumn("pct",
            col("n") * lit(100.0) / sum(col("n")).over(Window.partitionBy()))
          .orderBy("sentiment"),
      Some(
        s"""$cte, g AS (
           |  SELECT ${labelSql("polarity")} AS sentiment, count(*) AS n
           |  FROM scored GROUP BY 1)
           |SELECT sentiment, n, n * 100.0 / sum(n) OVER () AS pct
           |FROM g ORDER BY sentiment""".stripMargin)),

    // G1 + G4: total count and mean polarity (streamlit_app.py:159,215).
    // ULP-IMMUNE mean, not round(avg(double), 6): each engine's partial-
    // aggregation order can land an order-dependent double sum one ulp
    // either side of a 5e-7 rounding boundary and flip the 6th dp (the
    // emb_drift_by_label round-4 bug class). Each polarity snaps to a
    // 1e-10 grid (one IEEE multiply + half-away round of the identical
    // double — deterministic), the sum/count are exact int64, and the
    // 6-dp mean is a half-away-from-zero integer division — within
    // 5e-11 of the true mean, bit-identical cross-engine.
    Q(
      "doc_avg_polarity",
      (s, d) =>
        scored(s, d)
          .withColumn("pi",
            round(col("polarity").cast("double") * 1e10, 0).cast("long"))
          .agg(
            count(lit(1)).as("n_docs"),
            // sum accumulates as DECIMAL(38,0): the 1e10-grid int64
            // `2*sum(pi)` wraps silently past ~4.6e8 docs (non-ANSI
            // Spark) — decimal overflow is NULL (loud), values
            // identical below that; the oracle's sum is HUGEINT
            // natively
            expr(
              """CAST(CASE WHEN sum(pi) >= 0
                |  THEN (2 * sum(CAST(pi AS DECIMAL(19,0)))
                |      + count(pi) * 10000)
                |    div (2 * count(pi) * 10000)
                |  ELSE -((-2 * sum(CAST(pi AS DECIMAL(19,0)))
                |      + count(pi) * 10000)
                |    div (2 * count(pi) * 10000)) END AS DOUBLE) / 1e6"""
                .stripMargin).as("avg_polarity")),
      Some(
        s"""$cte, p AS (
           |  SELECT CAST(round(CAST(polarity AS DOUBLE) * 1e10, 0)
           |    AS BIGINT) AS pi
           |  FROM scored)
           |SELECT count(*) AS n_docs,
           |  CAST(CASE WHEN sum(pi) >= 0
           |    THEN (2 * sum(pi) + count(pi) * 10000)
           |      // (2 * count(pi) * 10000)
           |    ELSE -((-2 * sum(pi) + count(pi) * 10000)
           |      // (2 * count(pi) * 10000)) END AS DOUBLE) / 1e6
           |    AS avg_polarity
           |FROM p""".stripMargin)),

    // G6: fixed-width 30-bin histogram of polarity over [-1, 1]
    // (streamlit_app.py:290–296)
    Q(
      "doc_polarity_histogram",
      (s, d) =>
        scored(s, d)
          .withColumn("bin",
            least(floor((col("polarity") + lit(1.0)) / lit(2.0 / 30)),
              lit(29.0)).cast("int"))
          .groupBy("bin").agg(count(lit(1)).as("n"))
          .orderBy("bin"),
      Some(
        s"""$cte SELECT
           |  CAST(least(floor((polarity + 1.0) / (2.0 / 30)), 29.0) AS INT) AS bin,
           |  count(*) AS n
           |FROM scored GROUP BY 1 ORDER BY bin""".stripMargin)),

    // D1: keep-first dedup via row_number (deterministic form of
    // streamlit_app.py:147 drop_duplicates(keep="first"))
    Q(
      "doc_dedup_keepfirst",
      (s, d) =>
        scored(s, d)
          // partition on md5(text), not text: the shuffle key is 32 bytes
          // instead of the full document — at 100 TB that is the
          // difference between shuffling hashes and shuffling the corpus
          .withColumn("rn",
            row_number().over(
              Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
          .filter(col("rn") === 1)
          .select("doc_id", "n_chars")
          .orderBy("doc_id"),
      Some(
        s"""WITH r AS (
           |  SELECT doc_id, n_chars,
           |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           |  FROM documents)
           |SELECT doc_id, n_chars FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // O1 + L1: top-K by sort key (streamlit_app.py:317) — Catalyst plans
    // TakeOrderedAndProject, no full sort
    Q(
      "doc_topk_longest",
      (s, d) =>
        docs(s, d)
          .select("doc_id", "n_chars", "lang")
          .orderBy(col("n_chars").desc, col("doc_id"))
          .limit(20),
      Some(
        """SELECT doc_id, n_chars, lang FROM documents
          |ORDER BY n_chars DESC, doc_id LIMIT 20""".stripMargin)),

    // C5: string truncate + append (streamlit_app.py:130)
    Q(
      "doc_truncate",
      (s, d) =>
        docs(s, d)
          .withColumn("text_short",
            concat(substring(col("text"), 1, 80), lit("...")))
          .select("doc_id", "text_short")
          .orderBy("doc_id"),
      Some(
        """SELECT doc_id, substring(text, 1, 80) || '...' AS text_short
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // T1 + P4: union of heterogeneous projections with missing-column
    // null backfill (streamlit_app.py:93–115,119–126)
    Q(
      "doc_union_missing_cols",
      (s, d) => {
        val base = docs(s, d)
        val a = base.filter(col("lang") === "en").select("doc_id", "lang")
        val b = base.filter(col("lang") === "fr").select("doc_id", "n_chars")
        a.unionByName(b, allowMissingColumns = true).orderBy("doc_id")
      },
      Some(
        """SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars
          |FROM documents WHERE lang = 'en'
          |UNION ALL
          |SELECT doc_id, CAST(NULL AS VARCHAR) AS lang, n_chars
          |FROM documents WHERE lang = 'fr'
          |ORDER BY doc_id""".stripMargin)),

    // Text analysis: token count (whitespace tokenizer)
    Q(
      "doc_token_count",
      (s, d) =>
        scored(s, d)
          .select("doc_id", "n_tokens", "n_chars")
          .orderBy("doc_id"),
      Some(
        s"""$cte SELECT doc_id, n_tokens, n_chars FROM scored
           |ORDER BY doc_id""".stripMargin)),

    // Text analysis: document fingerprint — md5 over the normalized
    // token stream (stable under punctuation/whitespace noise)
    Q(
      "doc_fingerprint",
      (s, d) =>
        scored(s, d)
          .withColumn("fingerprint", md5(array_join(col("tok"), " ")))
          .select("doc_id", "fingerprint")
          .orderBy("doc_id"),
      Some(
        s"""$cte2 SELECT doc_id,
           |  md5(coalesce(array_to_string(tok, ' '), '')) AS fingerprint
           |FROM toks ORDER BY doc_id""".stripMargin)),

    // RAG chunking with overlap: fixed 32-token windows at stride 24
    // (8-token overlap so no retrieval boundary splits an answer span)
    // — the serving-side complement of doc_sequence_pack's
    // training-side packing. One scan, a ~n/stride-per-doc explode
    // (corpus-linear), no shuffle before the output sort; each chunk
    // travels as its md5 (the downstream chunk-store join key), never
    // re-materializing text. Docs whose normalized token stream is
    // empty produce no chunks (filtered identically on both sides —
    // Spark's sequence() would otherwise infer a DESCENDING step for
    // n=0 and DuckDB's truncating -1//24 would emit a phantom chunk).
    Q(
      "doc_chunk_overlap",
      (s, d) => {
        val W = 32
        val S = 24
        val start = col("k") * S + 1
        scored(s, d)
          .select(col("doc_id"), col("tok"), size(col("tok")).as("n"))
          .filter(col("n") >= 1)
          .select(col("doc_id"), col("tok"),
            explode(sequence(lit(0),
              floor((col("n") - 1) / lit(S)).cast("int"))).as("k"))
          .select(col("doc_id"), col("k").cast("long").as("chunk_idx"),
            start.cast("long").as("chunk_start"),
            size(slice(col("tok"), start, lit(W))).cast("long")
              .as("n_chunk_tokens"),
            md5(concat_ws(" ", slice(col("tok"), start, lit(W))))
              .as("chunk_md5"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some(
        s"""$cte2, base AS (
           |  SELECT doc_id, tok, len(tok) AS n FROM toks
           |  WHERE len(tok) >= 1
           |), ch AS (
           |  SELECT doc_id, tok, n,
           |    unnest(range(CAST((n - 1) // 24 AS INT) + 1)) AS k
           |  FROM base
           |)
           |SELECT doc_id, k AS chunk_idx,
           |  k * 24 + 1 AS chunk_start,
           |  len(tok[(k * 24 + 1):(k * 24 + 32)]) AS n_chunk_tokens,
           |  md5(array_to_string(tok[(k * 24 + 1):(k * 24 + 32)], ' '))
           |    AS chunk_md5
           |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Token-budget sampling: take documents per language in stable
    // doc_id order until each language's cumulative token count reaches
    // the budget — the "give me N tokens per language" selection step of
    // corpus assembly. The running sum is a window over (lang, doc_id):
    // ONE shuffle on lang, partial-agg-free but sort-bounded per
    // language. At 100 TB the same contract (deterministic, stable under
    // re-runs) comes from pre-bucketing by doc_id range per language so
    // each bucket computes its offset from per-bucket totals — the
    // window form here is the single-stage equivalent; determinism
    // (stable key order, no rand()) is what makes the sample
    // reproducible either way.
    Q(
      "doc_token_budget_sample",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        scored(s, d)
          .select(col("lang"), col("doc_id"), col("n_tokens"))
          .withColumn("cum_tokens",
            sum(col("n_tokens")).over(w).cast("long"))
          .filter(col("cum_tokens") <= 5000)
          .orderBy("lang", "doc_id")
      },
      Some(
        s"""$cte, c AS (
           |  SELECT lang, doc_id, n_tokens,
           |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      AS cum_tokens
           |  FROM scored)
           |SELECT lang, doc_id, n_tokens, cum_tokens FROM c
           |WHERE cum_tokens <= 5000 ORDER BY lang, doc_id""".stripMargin)),

    // Sequence packing (concat-and-chunk): per language, documents are
    // laid end-to-end in doc_id order and cut into fixed 2048-token
    // training sequences; each doc lands in the bin where its first
    // token falls (bin = floor(cum_before / B)). The per-(lang, bin)
    // stats are the packing audit a training run does before writing
    // shards — how many docs start in each sequence and how full it is.
    // Shape at scale: the running sum is one shuffle on lang (the same
    // partitioning doc_token_budget_sample reuses), and the bin agg is
    // partial-agg'd on (lang, bin) — output is total_tokens/B rows, not
    // corpus rows. A real shard-writer would range-partition on
    // (lang, bin) and write in the same pass.
    Q(
      "doc_sequence_pack",
      (s, d) => {
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        scored(s, d)
          .select(col("lang"), col("doc_id"), col("n_tokens"))
          .withColumn("cum_before",
            coalesce(sum(col("n_tokens")).over(w), lit(0)).cast("long"))
          .withColumn("bin", (col("cum_before") / lit(2048L)).cast("long"))
          .groupBy("lang", "bin")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("tokens_started"))
          .orderBy("lang", "bin")
      },
      Some(
        s"""$cte, c AS (
           |  SELECT lang, doc_id, n_tokens,
           |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang
           |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
           |      AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
           |  FROM scored)
           |SELECT lang, cum_before // 2048 AS bin, count(*) AS n_docs,
           |  CAST(sum(n_tokens) AS BIGINT) AS tokens_started
           |FROM c GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin)),

    // CONTEXT-LENGTH SIZING SWEEP — the pad-vs-truncate curve behind
    // the max_seq_len decision (and the measurement that motivates
    // sequence packing at all): for each candidate context length B,
    // one-doc-per-sequence batching pays B − n padding tokens on every
    // short doc and loses n − B tokens of every long one. Per B:
    // how many docs truncate, the token mass lost, the padding mass
    // wasted, and the resulting utilization. All counts are exact
    // integers (greatest/least against the broadcast 5-row spine);
    // utilization is one correctly-rounded division of identical
    // integers. Scale shape: the corpus is scanned once; the spine
    // cross joins 5x into a single partial-agg'd pass — output is 5
    // rows no matter the corpus. Docs with no tokenizable text carry
    // no length and are outside the sweep's universe on both engines.
    Q(
      "doc_context_length_sweep",
      (s, d) => {
        import s.implicits._
        // literal LocalRelation (not range/explode) so the BNLJ build
        // side matches the suite's bounded-frame plan guard
        // spine spans the corpus's own length scale (docs here run tens
        // of tokens) so BOTH failure modes register: short B truncates,
        // long B pads
        val spine = Seq(16, 32, 64, 128, 512).toDF("seq_len")
        scored(s, d)
          .select(col("doc_id"), col("n_tokens"))
          .filter(col("n_tokens").isNotNull)
          .crossJoin(broadcast(spine))
          .groupBy("seq_len")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("n_tokens") > col("seq_len"), 1L).otherwise(0L))
              .as("n_truncated"),
            sum(greatest(col("n_tokens") - col("seq_len"), lit(0)))
              .cast("long").as("tokens_truncated"),
            sum(greatest(col("seq_len") - col("n_tokens"), lit(0)))
              .cast("long").as("tokens_padded"),
            sum(least(col("n_tokens"), col("seq_len"))).cast("long")
              .as("tokens_kept"))
          .select(col("seq_len"), col("n_docs"), col("n_truncated"),
            col("tokens_truncated"), col("tokens_padded"),
            round(col("tokens_kept").cast("double") /
              (col("n_docs") * col("seq_len")).cast("double"), 6)
              .as("utilization"))
          .orderBy("seq_len")
      },
      Some(
        s"""$cte, pd AS (
           |  SELECT doc_id, n_tokens FROM scored
           |  WHERE n_tokens IS NOT NULL
           |), spine AS (
           |  SELECT unnest([16, 32, 64, 128, 512]) AS seq_len
           |)
           |SELECT CAST(seq_len AS INT) AS seq_len,
           |  count(*) AS n_docs,
           |  CAST(coalesce(sum(CASE WHEN n_tokens > seq_len THEN 1 END), 0)
           |    AS BIGINT) AS n_truncated,
           |  CAST(sum(greatest(n_tokens - seq_len, 0)) AS BIGINT)
           |    AS tokens_truncated,
           |  CAST(sum(greatest(seq_len - n_tokens, 0)) AS BIGINT)
           |    AS tokens_padded,
           |  round(CAST(sum(least(n_tokens, seq_len)) AS DOUBLE) /
           |    (count(*) * seq_len), 6) AS utilization
           |FROM pd CROSS JOIN spine
           |GROUP BY seq_len ORDER BY seq_len""".stripMargin)),

    // POST-SHUFFLE ORDER AUDIT — the check that proves the seeded
    // training shuffle (doc_train_shuffle) actually decorrelated
    // sources: per SHARD (the unit a data loader reads sequentially),
    // the observed count of adjacent same-source pairs in shuffle-key
    // order vs its exact expectation under a uniform random
    // permutation, E = Σ_src n_src(n_src−1) / n (emitted as the exact
    // integer numerator exp_num plus one rounded division). A shuffle
    // bug that leaves source runs intact shows up as observed >> E.
    // Scale shape: the adjacency window is PARTITIONED by shard (the
    // same per-shard sort the shard-writer itself runs —
    // never a global single-partition window), and the composition
    // side is two partial-agg'd reductions to |shards|·|sources| then
    // |shards| rows.
    Q(
      "doc_shuffle_audit",
      (s, d) => {
        val base = docs(s, d)
          .select(col("doc_id"), coalesce(col("source"), lit("")).as("src"))
          .withColumn("shuffle_key",
            md5(concat(lit("graft-epoch-1:"),
              col("doc_id").cast("string"))))
          .withColumn("shard",
            (expr("conv(substring(shuffle_key, 1, 2), 16, 10)")
              .cast("int") % 8).cast("int"))
        val w = Window.partitionBy(col("shard"))
          .orderBy(col("shuffle_key"), col("doc_id"))
        val adj = base
          .withColumn("same",
            when(lag(col("src"), 1).over(w) === col("src"), 1L)
              .otherwise(0L))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("same")).cast("long").as("n_adj_same"))
        val comp = base.groupBy("shard", "src")
          .agg(count(lit(1)).as("n"))
          .groupBy("shard")
          .agg(sum(col("n") * (col("n") - 1)).cast("long").as("exp_num"))
        adj.join(comp, "shard")
          .select(col("shard"), col("n_rows"), col("n_adj_same"),
            col("exp_num"),
            round(col("exp_num").cast("double") / col("n_rows"), 6)
              .as("expected_adj_same"))
          .orderBy("shard")
      },
      Some(
        """WITH b AS (
          |  SELECT doc_id, coalesce(source, '') AS src,
          |    md5('graft-epoch-1:' || CAST(doc_id AS VARCHAR))
          |      AS shuffle_key
          |  FROM documents
          |), b2 AS (
          |  SELECT *, CAST(CAST(('0x' || substr(shuffle_key, 1, 2))
          |    AS BIGINT) % 8 AS INT) AS shard
          |  FROM b
          |), a AS (
          |  SELECT shard, CASE WHEN lag(src) OVER (PARTITION BY shard
          |      ORDER BY shuffle_key, doc_id) = src
          |    THEN 1 ELSE 0 END AS same
          |  FROM b2
          |), adj AS (
          |  SELECT shard, count(*) AS n_rows,
          |    CAST(sum(same) AS BIGINT) AS n_adj_same
          |  FROM a GROUP BY 1
          |), cmp AS (
          |  SELECT shard, CAST(sum(n * (n - 1)) AS BIGINT) AS exp_num
          |  FROM (SELECT shard, src, count(*) AS n FROM b2 GROUP BY 1, 2) g
          |  GROUP BY 1
          |)
          |SELECT adj.shard, adj.n_rows, adj.n_adj_same, cmp.exp_num,
          |  round(CAST(cmp.exp_num AS DOUBLE) / adj.n_rows, 6)
          |    AS expected_adj_same
          |FROM adj JOIN cmp USING (shard) ORDER BY shard""".stripMargin)),

    // EPOCH-DIVERGENCE AUDIT — proves a new epoch's reshuffle is a
    // genuinely different permutation, not the same order re-labeled:
    // the joint distribution of (shard under epoch-1 seed, shard under
    // epoch-2 seed). Independent seeded hashes spread mass uniformly
    // over the 8x8 grid (diagonal ≈ 1/8 of rows); a reused seed or a
    // degenerate hash concentrates the diagonal, the bug that makes a
    // multi-epoch run see identical batch order twice. Counts are
    // exact integers over a partial-agg'd 64-cell reduction — one
    // corpus scan, output fixed at <= 64 rows at any scale.
    Q(
      "doc_epoch_divergence",
      (s, d) => {
        def shardOf(seed: String) =
          (expr(s"conv(substring(md5(concat('$seed', " +
            "CAST(doc_id AS STRING))), 1, 2), 16, 10)")
            .cast("int") % 8).cast("int")
        docs(s, d)
          .select(col("doc_id"))
          .withColumn("shard_e1", shardOf("graft-epoch-1:"))
          .withColumn("shard_e2", shardOf("graft-epoch-2:"))
          .groupBy("shard_e1", "shard_e2")
          .agg(count(lit(1)).as("n"))
          .orderBy("shard_e1", "shard_e2")
      },
      Some(
        """WITH b AS (
          |  SELECT
          |    CAST(CAST(('0x' || substr(md5('graft-epoch-1:' ||
          |      CAST(doc_id AS VARCHAR)), 1, 2)) AS BIGINT) % 8 AS INT)
          |      AS shard_e1,
          |    CAST(CAST(('0x' || substr(md5('graft-epoch-2:' ||
          |      CAST(doc_id AS VARCHAR)), 1, 2)) AS BIGINT) % 8 AS INT)
          |      AS shard_e2
          |  FROM documents
          |)
          |SELECT shard_e1, shard_e2, count(*) AS n
          |FROM b GROUP BY 1, 2 ORDER BY shard_e1, shard_e2""".stripMargin)),

    // Data-mixing weights: the per-(lang, source) upsampling factor that
    // would flatten the corpus to a uniform mixture — weight =
    // (N_total / n_groups) / n_group, emitted as an EXACT rational
    // (w_num = N_total, w_den = n_groups · n_group) so both engines
    // agree bit-for-bit with no float division. Shape at scale: one
    // partial-agg'd shuffle to the group counts (|lang|·|source| rows),
    // then the 2-number global stat joined back broadcast — the corpus
    // is scanned once and never re-shuffled.
    Q(
      "doc_mixing_weights",
      (s, d) => {
        val groups = docs(s, d).groupBy("lang", "source")
          .agg(count(lit(1)).as("n"))
        val stats = groups.agg(
          sum(col("n")).cast("long").as("n_total"),
          count(lit(1)).as("n_groups"))
        groups.crossJoin(broadcast(stats))
          .select(col("lang"), col("source"), col("n"),
            col("n_total").as("w_num"),
            (col("n_groups") * col("n")).as("w_den"))
          .orderBy("lang", "source")
      },
      Some(
        """WITH g AS (
          |  SELECT lang, source, count(*) AS n
          |  FROM documents GROUP BY 1, 2),
          |st AS (
          |  SELECT CAST(sum(n) AS BIGINT) AS n_total,
          |    count(*) AS n_groups FROM g)
          |SELECT lang, source, n, n_total AS w_num,
          |  n_groups * n AS w_den
          |FROM g CROSS JOIN st ORDER BY lang, source""".stripMargin)),

    // Temperature-scaled (α = 1/2) multilingual sampling weights — the
    // mT5/XLM-R low-resource upsampling rule: sample language l with
    // probability ∝ n_l^α, flattening the head (α=1 is proportional,
    // α=0 is doc_mixing_weights' uniform; α=1/2 is the classic
    // compromise). Cross-engine exactness without libm pow: α=1/2 makes
    // the unnormalized weight sqrt(n_l), and IEEE-754 REQUIRES sqrt to
    // be correctly rounded — so floor(sqrt(n)·1e6) is the same BIGINT
    // on both engines (unlike pow/log, which are only faithfully
    // rounded and may differ in the last ulp). All downstream
    // arithmetic is integral at ppm scale with DECIMAL/HUGEINT
    // products, so every output bit matches. Shape at scale: one
    // partial-agg'd shuffle to |lang| rows, the 2-number stat frame
    // broadcast back — identical cost to doc_mixing_weights.
    //   share_ppm  — observed mixture  n_l / N
    //   w_alpha_ppm — α-tempered mixture  √n_l / Σ√n
    //   boost_ppm  — upsampling factor  w_alpha / share (> 1e6 ⇔ the
    //                language is upsampled; en lands < 1e6, the tail > 1e6)
    Q(
      "doc_temperature_mix",
      (s, d) => {
        val g = docs(s, d).groupBy("lang")
          .agg(count(lit(1)).as("n"))
          .withColumn("s6",
            floor(sqrt(col("n").cast("double")) * 1e6))
        val st = g.agg(
          sum(col("n")).cast("long").as("n_total"),
          sum(col("s6")).cast("long").as("s_tot"))
        g.crossJoin(broadcast(st))
          .select(col("lang"), col("n").as("n_docs"),
            expr("n * 1000000 DIV n_total").as("share_ppm"),
            expr("CAST(CAST(s6 AS DECIMAL(38,0)) * 1000000 DIV s_tot AS BIGINT)")
              .as("w_alpha_ppm"),
            expr("""CAST(CAST(s6 AS DECIMAL(19,0)) * n_total * 1000000
                   | DIV (CAST(s_tot AS DECIMAL(19,0)) * n) AS BIGINT)"""
              .stripMargin).as("boost_ppm"))
          .orderBy("lang")
      },
      Some(
        """WITH g AS (
          |  SELECT lang, count(*) AS n,
          |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS s6
          |  FROM documents GROUP BY lang),
          |st AS (
          |  SELECT CAST(sum(n) AS BIGINT) AS n_total,
          |    CAST(sum(s6) AS BIGINT) AS s_tot FROM g)
          |SELECT lang, n AS n_docs,
          |  n * 1000000 // n_total AS share_ppm,
          |  CAST(CAST(s6 AS HUGEINT) * 1000000 // s_tot AS BIGINT)
          |    AS w_alpha_ppm,
          |  CAST(CAST(s6 AS HUGEINT) * n_total * 1000000
          |    // (CAST(s_tot AS HUGEINT) * n) AS BIGINT) AS boost_ppm
          |FROM g CROSS JOIN st ORDER BY lang""".stripMargin)),

    // Deterministic round-robin INTERLEAVE across sources — the
    // training-order construction that spreads each source evenly
    // through the epoch without RNG (consecutive same-source runs bias
    // gradient batches; a seeded shuffle isn't reproducible across
    // engines/partitionings, but rank-then-(rank, source) order is).
    // Position p reads: "the p-th document a sequential trainer sees".
    // Scale shape: per-source rank windows (partitioned — each source
    // sorts independently), then the global (rn, source) order is a
    // RANGE partition + local sort when materializing the full epoch;
    // this query emits the bounded head through a top-k heap
    // (TakeOrderedAndProject — no global sort here).
    Q(
      "doc_interleave_order",
      (s, d) => {
        // '' for null source everywhere: the engines' opposite default
        // null orderings must never pick different LIMIT-boundary rows
        val w = Window.partitionBy("src").orderBy("doc_id")
        docs(s, d)
          .select(coalesce(col("source"), lit("")).as("src"), col("doc_id"))
          .withColumn("rn", row_number().over(w))
          .orderBy("rn", "src", "doc_id")
          .limit(30)
      },
      Some(
        """SELECT coalesce(source, '') AS src, doc_id,
          |  row_number() OVER (PARTITION BY coalesce(source, '')
          |    ORDER BY doc_id) AS rn
          |FROM documents
          |ORDER BY rn, src, doc_id LIMIT 30""".stripMargin)),

    // Deterministic TRAINING-ORDER shuffle: the "shuffle your
    // pretraining corpus" step as a seeded hash permutation — order by
    // md5(seed || doc_id) — plus the shard each doc trains from (first
    // hash byte mod 8, the training-file assignment). Properties a
    // seeded rand() lacks: re-run-stable, repartition-stable, and a new
    // epoch is just a new seed string — no state to carry. Scale shape:
    // the ORDER BY plans the standard range-partitioned distributed
    // sort (sampled range exchange + per-partition sort — NEVER a
    // single-partition collapse; the suite's global-window guard would
    // catch that form); a shard-file writer at 100 TB would instead
    // repartition(shard) + sortWithinPartitions(shuffle_key) and skip
    // the global order entirely — same keys, same contract.
    Q(
      "doc_train_shuffle",
      (s, d) =>
        docs(s, d)
          .select(col("doc_id"))
          .withColumn("shuffle_key",
            md5(concat(lit("graft-epoch-1:"), col("doc_id").cast("string"))))
          .withColumn("shard",
            (expr("conv(substring(shuffle_key, 1, 2), 16, 10)")
              .cast("int") % 8).cast("int"))
          .orderBy("shuffle_key"),
      Some(
        """SELECT doc_id,
          |  md5('graft-epoch-1:' || CAST(doc_id AS VARCHAR))
          |    AS shuffle_key,
          |  CAST(CAST(('0x' || substr(
          |      md5('graft-epoch-1:' || CAST(doc_id AS VARCHAR)), 1, 2))
          |    AS BIGINT) % 8 AS INT) AS shard
          |FROM documents
          |ORDER BY shuffle_key""".stripMargin)),

    // Length-quartile strata per language (ntile): the per-stratum
    // assignment behind length-balanced eval sets and curriculum
    // ordering. Ties are broken by doc_id so both engines assign
    // identical quartiles. Shape: one shuffle on lang; each language
    // sorts independently (range-partition within lang at cluster
    // scale) — never a single global sort.
    Q(
      "doc_length_strata",
      (s, d) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("n_tokens"), col("doc_id"))
        scored(s, d)
          .select(col("lang"), col("doc_id"), col("n_tokens"))
          .withColumn("quartile", ntile(4).over(w))
          .orderBy("lang", "doc_id")
      },
      Some(
        s"""$cte SELECT lang, doc_id, n_tokens,
           |  ntile(4) OVER (PARTITION BY lang
           |    ORDER BY n_tokens, doc_id) AS quartile
           |FROM scored ORDER BY lang, doc_id""".stripMargin)),

    // TOKEN-WEIGHTED systematic sampling: k evenly spaced probe points
    // on each language's cumulative token axis pick the documents whose
    // token interval they land in — long docs are proportionally more
    // likely, the "sample by token mass, not doc count" selection of
    // corpus audits. Fully deterministic and EXACT: probe j sits at
    // (2j+1)·W/(2k), and membership is decided by cross-multiplied
    // integer inequalities — no float division anywhere, so both
    // engines pick identical docs. Shape: ONE scan, ONE shuffle — the
    // running sum and the language total are two frames over the SAME
    // lang partitioning (no second lineage, no join: the probe index
    // explodes k ways per row and filters, a narrow map) — zero-token
    // docs have empty intervals and can never be picked on either
    // engine.
    Q(
      "doc_weighted_sample",
      (s, d) => {
        val K = 4
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wAll = Window.partitionBy(col("lang"))
        scored(s, d)
          .select(col("lang"), col("doc_id"), col("n_tokens"))
          .withColumn("cum_before",
            coalesce(sum(col("n_tokens")).over(w), lit(0)).cast("long"))
          .withColumn("w_total",
            sum(col("n_tokens")).over(wAll).cast("long"))
          .withColumn("j", explode(sequence(lit(0), lit(K - 1))))
          .filter(
            lit(2 * K) * col("cum_before") <=
              (lit(2) * col("j") + 1) * col("w_total") &&
            (lit(2) * col("j") + 1) * col("w_total") <
              lit(2 * K) * (col("cum_before") + col("n_tokens")))
          .select(col("lang"), (col("j") + 1).cast("int").as("pick"),
            col("doc_id"), col("n_tokens"))
          .orderBy("lang", "pick")
      },
      Some(
        s"""$cte, c AS (
           |  SELECT lang, doc_id, n_tokens,
           |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang
           |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
           |      AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
           |    CAST(sum(n_tokens) OVER (PARTITION BY lang) AS BIGINT)
           |      AS w_total
           |  FROM scored)
           |SELECT lang, CAST(j + 1 AS INT) AS pick, doc_id, n_tokens
           |FROM c CROSS JOIN range(0, 4) r(j)
           |WHERE 8 * cum_before <= (2 * j + 1) * w_total
           |  AND (2 * j + 1) * w_total < 8 * (cum_before + n_tokens)
           |ORDER BY lang, pick""".stripMargin)),

    // MERGE/upsert (SCD-1 keep-newest) — the incremental-corpus
    // maintenance shape: a re-crawled batch (here the deterministic 10%
    // test bucket, texts revised) upserts into the corpus by doc_id.
    // Without MERGE INTO (no transactional table format in scope) the
    // engine-native form is anti-join + union: corpus rows whose key is
    // NOT in the batch survive, batch rows enter as-is. At 100 TB both
    // sides hash-shuffle once on doc_id (or zero times if the corpus
    // and batch share a bucketed layout — BucketingSpec's pattern); the
    // anti join is null-safe (a NULL-key corpus row matches nothing and
    // survives, same as SQL NOT EXISTS). Output is the per-source
    // audit: rows, updated rows, exact char mass after the merge.
    Q(
      "doc_upsert_merge",
      (s, d) => {
        val bucket =
          expr("conv(substring(md5(cast(doc_id AS string)), 1, 4), 16, 10)")
            .cast("long") % 100
        val revText =
          concat(substring(coalesce(col("text"), lit("")), 1, 120),
            lit(" rev2"))
        val batch = docs(s, d).filter(bucket >= 90)
          .select(col("doc_id"), revText.as("text"), col("lang"),
            col("source"), length(revText).cast("long").as("n_chars"),
            lit(1L).as("upd"))
        docs(s, d)
          .join(batch.select("doc_id"), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("text"), col("lang"), col("source"),
            col("n_chars"), lit(0L).as("upd"))
          .unionByName(batch)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("upd")).as("n_updated"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy("source")
      },
      Some(
        """WITH batch AS (
          |  SELECT doc_id,
          |    substr(coalesce(text, ''), 1, 120) || ' rev2' AS text,
          |    lang, source,
          |    CAST(length(substr(coalesce(text, ''), 1, 120) || ' rev2')
          |      AS BIGINT) AS n_chars,
          |    1 AS upd
          |  FROM documents
          |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
          |      AS BIGINT) % 100 >= 90
          |), merged AS (
          |  SELECT doc_id, text, lang, source, n_chars, 0 AS upd
          |  FROM documents d
          |  WHERE NOT EXISTS (SELECT 1 FROM batch b WHERE b.doc_id = d.doc_id)
          |  UNION ALL
          |  SELECT doc_id, text, lang, source, n_chars, upd FROM batch
          |)
          |SELECT source, count(*) AS n_docs,
          |  CAST(sum(upd) AS BIGINT) AS n_updated,
          |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
          |FROM merged GROUP BY 1 ORDER BY source NULLS FIRST""".stripMargin)),

    // Small-file compaction / target-size file planner — the 100 TB
    // write-path problem the other queries don't touch: a partitioned
    // corpus write wants files near a target size, not one file per
    // task. Greedy plan: within each lang partition, walk docs in
    // doc_id order and cut a new file every TargetChars of cumulative
    // payload — file_id = cum_before DIV TargetChars, where cum_before
    // is the running char mass BEFORE the doc (window frame ... 1
    // PRECEDING), so a doc always lands in the file its start offset
    // falls in. Output is the per-file manifest (doc count, char mass,
    // id range) a compaction job would execute with
    // repartitionByRange(lang, file_id).sortWithinPartitions — which is
    // exactly the shuffle this plan itself costs: one range-ish
    // partition per lang + an in-partition ordered window, no joins.
    // All integer arithmetic; the id-ordered walk makes the plan
    // deterministic cross-engine (NULLS FIRST pinned on both sides).
    Q(
      "doc_compaction_plan",
      (s, d) =>
        compactionAssignment(s, d)
          .groupBy(col("lang"), col("file_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("sz")).as("sz_chars"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy(col("lang").asc_nulls_first, col("file_id")),
      Some(
        """WITH s AS (
          |  SELECT doc_id, lang, coalesce(n_chars, 0) AS sz
          |  FROM documents
          |), c AS (
          |  SELECT lang, doc_id, sz,
          |    CAST(coalesce(sum(sz) OVER (
          |      PARTITION BY lang ORDER BY doc_id NULLS FIRST
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |      AS BIGINT) AS cum_before
          |  FROM s
          |)
          |SELECT lang, cum_before // 8192 AS file_id,
          |  count(*) AS n_docs,
          |  CAST(sum(sz) AS BIGINT) AS sz_chars,
          |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
          |FROM c GROUP BY 1, 2
          |ORDER BY lang NULLS FIRST, file_id""".stripMargin)),

    // Incremental view maintenance (IVM) over a per-language count —
    // the algebra that keeps a materialized aggregate fresh under a
    // CDC changelog WITHOUT recomputing it (the batch twin of the
    // streaming upsert sink's CDC diff): a simulated re-crawl rewrites
    // every doc_id % 10 == 0 document's lang to 'en'; each rewrite
    // contributes (-1, old_lang), (+1, 'en') changelog deltas; the
    // maintained count is base + Σdelta, VERIFIED against the direct
    // recompute on the updated table (ivm_holds must be true for every
    // group — counts are a self-maintainable aggregate, the property
    // this query pins). NULL langs ride a sentinel so the null group
    // survives the group-key join on both engines. Scale shape: ONE
    // scan emits all three contribution kinds through one explode
    // (base / delta / direct), one partial-agg'd lang shuffle, output
    // bounded by |langs| — the delta stream at 100 TB is the (tiny)
    // changed-row set, which is the entire point of IVM.
    Q(
      "doc_ivm_lang_counts",
      (s, d) => {
        val gb = coalesce(col("lang"), lit("__null")).as("g_b")
        val ga = when(col("doc_id") % 10 === 0, lit("en"))
          .otherwise(coalesce(col("lang"), lit("__null"))).as("g_a")
        val contrib = docs(s, d)
          .select(col("doc_id"), gb, ga)
          .select(explode(concat(
            array(
              struct(col("g_b").as("g"), lit("base").as("t"),
                lit(1L).as("v")),
              struct(col("g_a").as("g"), lit("direct").as("t"),
                lit(1L).as("v"))),
            when(!(col("g_b") <=> col("g_a")), array(
              struct(col("g_b").as("g"), lit("delta").as("t"),
                lit(-1L).as("v")),
              struct(col("g_a").as("g"), lit("delta").as("t"),
                lit(1L).as("v"))))
              .otherwise(array().cast(
                "array<struct<g:string,t:string,v:bigint>>"))))
            .as("x"))
          .select(col("x.g").as("lang"), col("x.t").as("t"),
            col("x.v").as("v"))
        contrib.groupBy("lang")
          .agg(
            sum(when(col("t") === "base", col("v"))).as("n_before"),
            coalesce(sum(when(col("t") === "delta", col("v"))), lit(0L))
              .as("delta"),
            sum(when(col("t") === "direct", col("v"))).as("n_direct"))
          .select(col("lang"),
            coalesce(col("n_before"), lit(0L)).as("n_before"),
            col("delta"),
            (coalesce(col("n_before"), lit(0L)) + col("delta"))
              .as("n_after"),
            ((coalesce(col("n_before"), lit(0L)) + col("delta")) <=>
              coalesce(col("n_direct"), lit(0L))).as("ivm_holds"))
          .orderBy("lang")
      },
      Some(
        """WITH src AS (
          |  SELECT doc_id, coalesce(lang, '__null') AS g_b,
          |    CASE WHEN doc_id % 10 = 0 THEN 'en'
          |         ELSE coalesce(lang, '__null') END AS g_a
          |  FROM documents
          |), contrib AS (
          |  SELECT g_b AS lang, 'base' AS t, CAST(1 AS BIGINT) AS v
          |  FROM src
          |  UNION ALL
          |  SELECT g_a, 'direct', 1 FROM src
          |  UNION ALL
          |  SELECT g_b, 'delta', -1 FROM src WHERE g_b IS DISTINCT FROM g_a
          |  UNION ALL
          |  SELECT g_a, 'delta', 1 FROM src WHERE g_b IS DISTINCT FROM g_a
          |), agg AS (
          |  SELECT lang,
          |    CAST(coalesce(sum(CASE WHEN t = 'base' THEN v END), 0)
          |      AS BIGINT) AS n_before,
          |    CAST(coalesce(sum(CASE WHEN t = 'delta' THEN v END), 0)
          |      AS BIGINT) AS delta,
          |    CAST(coalesce(sum(CASE WHEN t = 'direct' THEN v END), 0)
          |      AS BIGINT) AS n_direct
          |  FROM contrib GROUP BY lang
          |)
          |SELECT lang, n_before, delta, n_before + delta AS n_after,
          |  n_before + delta = n_direct AS ivm_holds
          |FROM agg ORDER BY lang""".stripMargin)),

    // SCD Type-2 history build — the validity-interval dimension table
    // a warehouse keeps when attributes change over re-crawls (the
    // batch sibling of doc_ivm_lang_counts' changelog and the
    // SCD-1 upsert sink's keep-latest): three simulated crawls rewrite
    // lang for doc_id%10==0 (crawl 2 -> 'en') and doc_id%20==0
    // (crawl 3 -> 'fr'); change detection (lag) keeps a version row
    // ONLY when the attribute actually changed, then valid_to chains
    // from the NEXT version's valid_from (lead) with 999 as the
    // open-interval sentinel and is_current its flag. By construction
    // the intervals per key are contiguous, non-overlapping, and
    // exactly one is open — version_no (row_number) makes that
    // hash-visible. Output keeps only multi-version docs (the history
    // a dashboard queries); single-version keys would triple the row
    // count with no information. Scale shape: a 3x explode then ONE
    // doc_id-partitioned window chain (lag + lead + row_number share
    // the exchange and sort); no join, no global window, output
    // bounded by the changed-key count — at 100 TB the explode is the
    // crawl count (bounded), never corpus^2.
    Q(
      "doc_scd2_history",
      (s, d) => {
        val w = Window.partitionBy("doc_id").orderBy("crawl")
        val wd = Window.partitionBy("doc_id")
        scd2Intervals(s, d)
          .withColumn("version_no", row_number().over(w))
          .withColumn("n_versions", count(lit(1)).over(wd))
          .filter(col("n_versions") >= 2)
          .select(col("doc_id"), col("version_no"), col("lang_v"),
            col("valid_from"), col("valid_to"),
            (col("valid_to") === 999).as("is_current"))
          .orderBy("doc_id", "valid_from")
      },
      Some(
        s"""$scd2IntervalsCte, kept AS (
           |  SELECT doc_id, crawl, lang_v,
           |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY crawl)
           |      AS INT) AS version_no,
           |    valid_to,
           |    count(*) OVER (PARTITION BY doc_id) AS n_versions
           |  FROM iv
           |)
           |SELECT doc_id, version_no, lang_v, CAST(crawl AS INT)
           |    AS valid_from, valid_to, valid_to = 999 AS is_current
           |FROM kept WHERE n_versions >= 2
           |ORDER BY doc_id, valid_from""".stripMargin)),

    // Temporal AS-OF read over the SCD2 intervals — the query that
    // makes a validity-interval table worth keeping: reconstruct the
    // dimension's state at a past point (crawl 2) and at the present
    // (crawl 3) in ONE pass by conditional aggregation over
    // valid_from <= t < valid_to, and report the per-lang population
    // shift between the two snapshots. Shares [[scd2Intervals]] /
    // [[scd2IntervalsCte]] with doc_scd2_history verbatim, so the
    // history the dashboard shows and the state this query
    // reconstructs can never drift. Scale shape: the interval build's
    // one doc_id window chain, then a |langs|-bounded aggregate — the
    // as-of predicate never joins or re-scans.
    Q(
      "doc_scd2_asof",
      (s, d) =>
        scd2Intervals(s, d)
          .groupBy(col("lang_v").as("lang"))
          .agg(
            count(when(col("valid_from") <= 2 && col("valid_to") > 2, 1))
              .as("n_asof_crawl2"),
            count(when(col("valid_from") <= 3 && col("valid_to") > 3, 1))
              .as("n_asof_crawl3"))
          .withColumn("shift",
            col("n_asof_crawl3") - col("n_asof_crawl2"))
          .filter(col("n_asof_crawl2") > 0 || col("n_asof_crawl3") > 0)
          .orderBy("lang"),
      Some(
        s"""$scd2IntervalsCte
           |SELECT lang_v AS lang,
           |  count(CASE WHEN valid_from <= 2 AND valid_to > 2 THEN 1 END)
           |    AS n_asof_crawl2,
           |  count(CASE WHEN valid_from <= 3 AND valid_to > 3 THEN 1 END)
           |    AS n_asof_crawl3,
           |  count(CASE WHEN valid_from <= 3 AND valid_to > 3 THEN 1 END)
           |  - count(CASE WHEN valid_from <= 2 AND valid_to > 2 THEN 1 END)
           |    AS shift
           |FROM iv
           |GROUP BY 1
           |HAVING count(CASE WHEN valid_from <= 2 AND valid_to > 2
           |    THEN 1 END) > 0
           |  OR count(CASE WHEN valid_from <= 3 AND valid_to > 3
           |    THEN 1 END) > 0
           |ORDER BY lang""".stripMargin))
  )

  /** The SCD2 validity intervals (doc_id, crawl, lang_v, valid_from,
    * valid_to) from three simulated crawls — THE single definition
    * shared by doc_scd2_history and doc_scd2_asof (with
    * [[scd2IntervalsCte]] its DuckDB twin) so the two can never drift.
    * Change detection keeps a version only when lang actually changed;
    * valid_to chains from the next version (999 = open interval).
    */
  private def scd2Intervals(s: SparkSession, d: String): DataFrame = {
    val lang0 = coalesce(col("lang"), lit("__null"))
    val w = Window.partitionBy("doc_id").orderBy("crawl")
    docs(s, d)
      .select(col("doc_id"), explode(array(
        struct(lit(1).as("crawl"), lang0.as("lang_v")),
        struct(lit(2).as("crawl"),
          when(col("doc_id") % 10 === 0, lit("en")).otherwise(lang0)
            .as("lang_v")),
        struct(lit(3).as("crawl"),
          when(col("doc_id") % 20 === 0, lit("fr"))
            .when(col("doc_id") % 10 === 0, lit("en")).otherwise(lang0)
            .as("lang_v")))).as("v"))
      .select(col("doc_id"), col("v.crawl").as("crawl"),
        col("v.lang_v").as("lang_v"))
      .withColumn("prev", lag(col("lang_v"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("lang_v"))
      .withColumn("valid_from", col("crawl"))
      .withColumn("valid_to",
        coalesce(lead(col("crawl"), 1).over(w), lit(999)))
      .drop("prev")
  }

  /** DuckDB twin of [[scd2Intervals]]; ends with CTE `iv`. A `def`,
    * not a `val`: `qs` interpolates it eagerly at object init, and a
    * forward val reference would read null (the EventQueries.PrScale
    * lesson).
    */
  private def scd2IntervalsCte: String =
    """WITH src AS (
      |  SELECT doc_id, coalesce(lang, '__null') AS lang0
      |  FROM documents
      |), versions AS (
      |  SELECT doc_id, 1 AS crawl, lang0 AS lang_v FROM src
      |  UNION ALL
      |  SELECT doc_id, 2,
      |    CASE WHEN doc_id % 10 = 0 THEN 'en' ELSE lang0 END FROM src
      |  UNION ALL
      |  SELECT doc_id, 3,
      |    CASE WHEN doc_id % 20 = 0 THEN 'fr'
      |         WHEN doc_id % 10 = 0 THEN 'en' ELSE lang0 END FROM src
      |), chg AS (
      |  SELECT doc_id, crawl, lang_v,
      |    lag(lang_v) OVER (PARTITION BY doc_id ORDER BY crawl) AS prev
      |  FROM versions
      |), iv AS (
      |  SELECT doc_id, crawl, lang_v,
      |    CAST(crawl AS INT) AS valid_from,
      |    CAST(coalesce(lead(crawl)
      |      OVER (PARTITION BY doc_id ORDER BY crawl), 999) AS INT)
      |      AS valid_to
      |  FROM chg WHERE prev IS NULL OR prev <> lang_v
      |)""".stripMargin

  /** doc_compaction_plan's per-doc file assignment, shared with the
    * BucketingSpec test that EXECUTES the plan (repartition by
    * (lang, file_id) + partitioned write) and checks the produced file
    * layout matches the manifest — the planner is not just an audit.
    */
  private[graft] def compactionAssignment(s: SparkSession,
      d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("doc_id").asc_nulls_first)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    docs(s, d)
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_chars"), lit(0L)).as("sz"))
      .withColumn("cum_before",
        coalesce(sum(col("sz")).over(w), lit(0L)))
      .withColumn("file_id", expr("cum_before DIV 8192"))
  }

  /** CTE variant exposing the token list itself (fingerprint needs `tok`,
    * which `scored` drops).
    */
  private def cte2: String =
    s"""WITH cleaned AS (
       |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
       |), toks AS (
       |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
       |)""".stripMargin
}
