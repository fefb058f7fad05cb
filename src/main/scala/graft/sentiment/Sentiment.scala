package graft.sentiment

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pattern-style sentiment scoring (the reference's U1/U2 surface,
  * streaming_pipeline.py:48–70).
  *
  * `polarity` is the one genuinely custom compute kernel in the whole
  * reference; everything downstream of it (label thresholds, confidence
  * CASE) is expressed as native when/otherwise columns so Catalyst can
  * fold/codegen them — never as UDFs (SURVEY.md §2.4 U2 note).
  */
object Sentiment {

  /** precompiled — String.split("\\s+") would recompile the pattern per
    * row, which dominates at millions of articles/s
    */
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** Score cleaned, lowercased text. Semantics pinned by golden tests:
    *  - null/empty/no-lexicon-match => 0.0f (reference
    *    streaming_pipeline.py:50–55)
    *  - per-match base polarity, scaled by an intensifier directly before
    *    it and flipped*damped (× -0.5) by a negator in the two tokens
    *    before it
    *  - result = average over matches, clamped to [-1, 1]
    */
  def polarity(text: String): Float = {
    if (text == null) return 0.0f
    val toks = Whitespace.split(text).filter(_.nonEmpty)
    if (toks.isEmpty) return 0.0f
    var sum = 0.0f
    var n = 0
    var i = 0
    while (i < toks.length) {
      Lexicon.polarity.get(toks(i)) match {
        case Some(base) =>
          var p = base
          if (i > 0) Lexicon.intensifiers.get(toks(i - 1)).foreach(p *= _)
          val negated = (i > 0 && Lexicon.negators(toks(i - 1))) ||
            (i > 1 && Lexicon.negators(toks(i - 2)))
          if (negated) p *= -0.5f
          sum += p
          n += 1
        case None =>
      }
      i += 1
    }
    if (n == 0) 0.0f
    else math.max(-1.0f, math.min(1.0f, sum / n))
  }

  /** U1 as a Scala UDF (option (a) of SURVEY.md §2.4; the native
    * Expression variant is in graft.functions.PolarityExpression).
    * NOTE: a UDF is an optimization barrier — keep the cheap non-empty
    * filter BEFORE this column, like the reference does deliberately
    * (SURVEY.md §4 "predicate placement").
    */
  val polarityUdf = udf((s: String) => polarity(s))

  /** Same algorithm in Double arithmetic. The Float form above pins the
    * reference's output type (streaming_pipeline.py:69 FloatType); this
    * one exists so cross-engine oracles can reproduce the accumulation
    * bit-for-bit (a float sum rounds differently at round-N boundaries —
    * e.g. avg 0.95/8 = exactly 0.11875).
    */
  def polarityDouble(text: String): Double = {
    if (text == null) return 0.0
    val toks = Whitespace.split(text).filter(_.nonEmpty)
    var sum = 0.0
    var n = 0
    var i = 0
    while (i < toks.length) {
      Lexicon.polarity.get(toks(i)) match {
        case Some(base) =>
          var p: Double = base.toDouble
          if (i > 0) Lexicon.intensifiers.get(toks(i - 1))
            .foreach(f => p *= f.toDouble)
          val negated = (i > 0 && Lexicon.negators(toks(i - 1))) ||
            (i > 1 && Lexicon.negators(toks(i - 2)))
          if (negated) p *= -0.5
          sum += p
          n += 1
        case None =>
      }
      i += 1
    }
    if (n == 0) 0.0 else math.max(-1.0, math.min(1.0, sum / n))
  }

  val polarityDoubleUdf = udf((s: String) => polarityDouble(s))

  /** U2: >0.1 Positive, < -0.1 Negative, else (incl. null) Neutral.
    * FLOAT-literal twin of TextFns.label — see the note there before
    * touching thresholds.
    */
  def label(p: Column): Column =
    when(p > 0.1f, "Positive").when(p < -0.1f, "Negative")
      .otherwise("Neutral")

  /** C2: |p|>0.5 High, |p|>0.2 Medium, else Low. */
  def confidence(p: Column): Column =
    when(abs(p) > 0.5f, "High").when(abs(p) > 0.2f, "Medium")
      .otherwise("Low")
}
