package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary as a mergeable typed Aggregator.
  *
  * The classic deterministic frequent-items sketch: at most `k` counters
  * regardless of stream length. Inserting a resident term increments its
  * counter; a non-resident term either claims a free slot or decrements
  * every counter by 1 (dropping zeros). Merging two summaries adds
  * counters pointwise, then subtracts the (k+1)-th largest value from
  * every counter and drops the non-positive ones — the Agarwal et al.
  * "Mergeable Summaries" (PODS'12) merge, which preserves the MG
  * guarantee under ARBITRARY merge trees:
  *
  *   true(x) - N/(k+1)  <=  counter(x)  <=  true(x)
  *
  * for every term x (counter(x) = 0 if absent), where N is the total
  * stream length. Hence every term with true count > N/(k+1) is
  * guaranteed present.
  *
  * Scale shape: this is exactly a partial+final aggregate — each
  * partition reduces its token stream into a <= k-entry map, the shuffle
  * moves only those maps (one per partition, O(k) entries each), and the
  * final merge combines them associatively. At 100 TB the exchange
  * carries partitions x k entries, independent of corpus size — the
  * bounded-memory alternative to the exact term count whose reducer
  * state is the full vocabulary. The summary CONTENT depends on
  * reduce/merge order (any valid MG summary is acceptable); only the
  * guarantee above is deterministic, so consumers (and the oracle) must
  * gate on the bounds, not the raw counters — see doc_mg_heavy_hitters.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "MisraGriesAgg needs k > 0")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], term: String): Map[String, Long] =
    buf.get(term) match {
      case Some(c) => buf.updated(term, c + 1L)
      case None if buf.size < k => buf.updated(term, 1L)
      case None =>
        // decrement-all: total mass drops by |buf| >= k per pass, so the
        // amortized cost over the stream is O(1) per insert
        buf.iterator
          .map { case (t, c) => (t, c - 1L) }
          .filter(_._2 > 0L)
          .toMap
    }

  override def merge(m1: Map[String, Long], m2: Map[String, Long]): Map[String, Long] = {
    val combined = m2.foldLeft(m1) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // subtract the (k+1)-th largest counter from every entry; at most
      // k entries stay strictly positive
      val kth = combined.valuesIterator.toArray.sortBy(-_).apply(k)
      combined.iterator
        .map { case (t, c) => (t, c - kth) }
        .filter(_._2 > 0L)
        .toMap
    }
  }

  override def finish(reduction: Map[String, Long]): Map[String, Long] =
    reduction

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
