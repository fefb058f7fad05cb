package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-pipeline column functions re-expressing the reference's cleaning /
  * sentiment surface (reference: streaming_pipeline.py:48–70,122–151;
  * work.py:87–105,229–248) as pure built-in Spark expressions — no UDFs, so
  * the whole pipeline stays inside whole-stage codegen and Catalyst can
  * reorder/push around it.
  *
  * Every function has a DuckDB-SQL twin (suffix `Sql`) built from the SAME
  * lexicon constants, so the driver's oracle runs semantically identical
  * SQL. The scoring itself is lexicon polarity = (#pos - #neg) / #tokens,
  * the SQL-expressible core of the pattern-lexicon family the reference's
  * TextBlob scorer belongs to; the richer negation/intensifier scorer (a
  * Scala function, not SQL-expressible) lives in [[graft.sentiment]].
  */
object TextFns {
  /** Lexicon chosen to overlap the synthetic testdata vocabulary (fast/
    * slow/big/small appear in documents.text) plus common sentiment words.
    */
  val Pos: Seq[String] = Seq(
    "fast", "big", "good", "great", "best", "quick", "smart", "fresh",
    "clean", "efficient")
  val Neg: Seq[String] = Seq(
    "slow", "small", "bad", "error", "fail", "worst", "poor", "broken",
    "corrupt", "dirty")

  // ---- Spark side ----------------------------------------------------

  /** P3: lower + strip non-letters (reference streaming_pipeline.py:122–128).
    * NULL text normalizes to '' HERE, at the single entry point of every
    * text lineage — Spark and DuckDB propagate NULL through
    * regexp/split/list functions differently, so letting a NULL survive
    * past this point means engine-specific downstream semantics. A NULL
    * doc therefore behaves exactly like an empty doc everywhere
    * (fingerprints, quality ratios, polarity 0.0, dedup grouping).
    *
    * Runs as the one-pass [[CleanText]] kernel; [[cleanRegex]] keeps the
    * composed regexp form as the spec ground truth (CleanTextSpec pins
    * kernel == regex over adversarial inputs and the test corpus).
    */
  def clean(c: Column): Column = CleanText.column(c)

  /** The composed-builtin twin of [[clean]] — two engine passes
    * (regex walk + lower) materializing an intermediate string. Kept as
    * the property-spec ground truth; queries use the kernel.
    */
  def cleanRegex(c: Column): Column =
    lower(regexp_replace(coalesce(c, lit("")), "[^a-zA-Z\\s]", ""))

  /** Whitespace tokenization of a cleaned string; no empty tokens. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= lit(""))

  def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Lexicon polarity in [-1, 1]; 0.0 for empty text (reference
    * streaming_pipeline.py:50–55 null/empty => 0.0 semantics).
    */
  def polarity(toks: Column): Column =
    (countIn(toks, Pos) - countIn(toks, Neg)).cast(DoubleType) /
      greatest(size(toks), lit(1))

  /** PII-style redaction: emails, then URLs, then digit runs rewritten
    * to placeholder tags — in that order, because emails/URLs contain
    * digits, so digit redaction must run last. Char-class-only regexes
    * (no backrefs/lookaround), so Java and DuckDB's RE2 match
    * identically; NULL normalizes to '' like clean().
    */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(coalesce(c, lit("")),
          "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+", "<EMAIL>"),
        "https?://[^\\s]+", "<URL>"),
      "[0-9]+", "<NUM>")

  def redactSql(e: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace(coalesce($e, ''),
       |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', '<EMAIL>', 'g'),
       |    'https?://[^\\s]+', '<URL>', 'g'),
       |    '[0-9]+', '<NUM>', 'g')""".stripMargin

  /** U2 thresholds (reference streaming_pipeline.py:57–66): never a UDF.
    * NOTE: deliberately a twin of Sentiment.label, not a delegate — this
    * one compares against DOUBLE literals for the double-typed oracle
    * queries, Sentiment's compares against FLOAT literals for reference
    * output parity. 0.1f widens to 0.10000000149…, so mixing them would
    * move the threshold. Keep both in sync on the 0.1/0.2/0.5 values.
    */
  def label(p: Column): Column =
    when(p > 0.1, "Positive").when(p < -0.1, "Negative").otherwise("Neutral")

  /** C2 confidence CASE (reference streaming_pipeline.py:145–151). */
  def confidence(p: Column): Column =
    when(abs(p) > 0.5, "High").when(abs(p) > 0.2, "Medium").otherwise("Low")

  // ---- DuckDB twins (for Q.oracle) -----------------------------------

  def sqlIn(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ",", ")")

  def cleanSql(e: String): String =
    s"lower(regexp_replace(coalesce($e, ''), '[^a-zA-Z\\s]', '', 'g'))"

  def tokensSql(e: String): String =
    s"list_filter(string_split_regex($e, '\\s+'), x -> x <> '')"

  def countInSql(toks: String, words: Seq[String]): String =
    s"len(list_filter($toks, x -> x IN ${sqlIn(words)}))"

  def polaritySql(toks: String): String =
    s"CAST(${countInSql(toks, Pos)} - ${countInSql(toks, Neg)} AS DOUBLE)" +
      s" / greatest(len($toks), 1)"

  def labelSql(p: String): String =
    s"CASE WHEN $p > 0.1 THEN 'Positive' WHEN $p < -0.1 THEN 'Negative' ELSE 'Neutral' END"

  def confidenceSql(p: String): String =
    s"CASE WHEN abs($p) > 0.5 THEN 'High' WHEN abs($p) > 0.2 THEN 'Medium' ELSE 'Low' END"

  /** Shared CTE prefix: documents -> cleaned text + token list + polarity.
    * Column names line up with the Spark-side pipeline in DocQueries.
    */
  val docPolarityCte: String =
    s"""WITH cleaned AS (
       |  SELECT doc_id, lang, source, n_chars, text,
       |         ${cleanSql("text")} AS text_clean
       |  FROM documents
       |), toks AS (
       |  SELECT *, ${tokensSql("text_clean")} AS tok FROM cleaned
       |), scored AS (
       |  SELECT doc_id, lang, source, n_chars, text, text_clean,
       |         ${polaritySql("tok")} AS polarity, len(tok) AS n_tokens
       |  FROM toks
       |)""".stripMargin
}
