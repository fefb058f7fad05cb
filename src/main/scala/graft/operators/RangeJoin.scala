package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (bucketed) range join — the scale path for PURE inequality
  * joins (`point BETWEEN lo AND hi` with no equality key), which Catalyst
  * can only plan as a nested-loop join: broadcast-NL when one side is
  * small, else an O(|left|·|right|) disaster at 100 TB.
  *
  * The banding trick (the standard interval-join decomposition, cf. the
  * reference engines' interval/ASOF machinery): pick a band width, map
  * each left point to its band, explode each right interval into every
  * band it overlaps, equi-join on the band id, and re-check the exact
  * predicate. The join becomes a plain shuffle/broadcast HASH join —
  * partitionable, AQE-skew-splittable — with per-band fan-out bounded by
  * interval_width/band_width + 1. Width tuning trades explode fan-out
  * against band selectivity; at cluster scale you size it near the
  * median interval width.
  *
  * Chosen over a custom SparkPlan (brief preference order: composition
  * first) because built-ins express the semantics exactly, and every
  * piece — explode, hash join, AQE — is already distributed-correct.
  */
object RangeJoin {

  /** `left JOIN right ON left.point BETWEEN right.lo AND right.hi`
    * (inclusive ends), banded at `width`. Column-name args keep the join
    * unambiguous; `__band` is internal and dropped. Null points/bounds
    * never match, like the raw predicate.
    */
  def bucketed(left: DataFrame, right: DataFrame,
      point: String, lo: String, hi: String, width: Double): DataFrame = {
    require(width > 0, "band width must be positive")
    val lb = left.withColumn("__band", floor(col(point) / width))
    // inverted intervals (lo > hi) match nothing under BETWEEN — drop
    // them BEFORE explode, where sequence() would otherwise generate a
    // full descending band list that is shuffled and then filtered away.
    // NOTE on fan-out: a single interval explodes into
    // (hi-lo)/width + 1 bands; size `width` near the median interval
    // width so outlier-wide intervals don't dominate (Spark caps a
    // generated sequence at ~2^31 elements and errors past it).
    val rb = right.filter(col(lo) <= col(hi)).withColumn("__band",
      explode(sequence(floor(col(lo) / width), floor(col(hi) / width))))
    lb.join(rb, "__band")
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("__band")
  }
}
