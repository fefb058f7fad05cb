package graft.sentiment

/** Embedded sentiment lexicon for the pattern-style scorer.
  *
  * The reference scores polarity with TextBlob's PatternAnalyzer
  * (reference streaming_pipeline.py:48–55, work.py:87–94), which averages
  * per-word lexicon polarities with negation flips and intensifier
  * scaling — the published Pattern-library algorithm family. Numeric
  * parity with TextBlob is impossible without its proprietary-size
  * lexicon (SURVEY.md §7.3.1), so this engine pins its own small lexicon
  * and defines correctness against it (golden tests in
  * NewsPipelineSpec).
  */
object Lexicon {
  /** word -> base polarity in [-1, 1] */
  val polarity: Map[String, Float] = Map(
    // general sentiment vocabulary
    "good" -> 0.7f, "great" -> 0.8f, "excellent" -> 1.0f, "best" -> 1.0f,
    "happy" -> 0.8f, "love" -> 0.5f, "wonderful" -> 1.0f, "amazing" -> 0.6f,
    "positive" -> 0.5f, "success" -> 0.6f, "successful" -> 0.6f,
    "win" -> 0.6f, "wins" -> 0.6f, "growth" -> 0.4f, "strong" -> 0.4f,
    "improve" -> 0.4f, "improved" -> 0.4f, "gain" -> 0.4f, "gains" -> 0.4f,
    "record" -> 0.3f, "new" -> 0.1f, "fresh" -> 0.3f, "efficient" -> 0.5f,
    "fast" -> 0.4f, "big" -> 0.2f, "clean" -> 0.4f, "smart" -> 0.5f,
    "quick" -> 0.3f,
    "bad" -> -0.7f, "terrible" -> -1.0f, "worst" -> -1.0f, "awful" -> -1.0f,
    "sad" -> -0.5f, "hate" -> -0.8f, "negative" -> -0.5f, "fail" -> -0.6f,
    "failed" -> -0.6f, "failure" -> -0.6f, "loss" -> -0.4f,
    "losses" -> -0.4f, "crisis" -> -0.6f, "crash" -> -0.7f,
    "decline" -> -0.4f, "weak" -> -0.4f, "fear" -> -0.6f, "risk" -> -0.3f,
    "threat" -> -0.5f, "war" -> -0.8f, "death" -> -0.8f, "dead" -> -0.8f,
    "slow" -> -0.3f, "small" -> -0.1f, "error" -> -0.5f, "poor" -> -0.6f,
    "broken" -> -0.6f, "corrupt" -> -0.8f, "dirty" -> -0.5f)

  /** negators flip and dampen the next lexicon word (pattern-family
    * semantics: "not good" ≈ -0.5 * polarity("good"))
    */
  val negators: Set[String] =
    Set("not", "no", "never", "none", "neither", "nor", "cannot", "nt")

  /** intensifiers scale the next lexicon word */
  val intensifiers: Map[String, Float] = Map(
    "very" -> 1.3f, "really" -> 1.3f, "extremely" -> 1.5f, "so" -> 1.3f,
    "too" -> 1.3f, "quite" -> 1.2f, "rather" -> 1.1f, "somewhat" -> 0.8f,
    "slightly" -> 0.7f, "barely" -> 0.6f, "hardly" -> 0.6f)
}
