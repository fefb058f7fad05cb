package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY.md §7.2's optional custom aggregate):
  * keeps the k highest-scored (score, id) pairs per group with a bounded
  * O(k) buffer, merging partials associatively — so grouped top-k runs
  * as partial+final aggregation with map-side combine instead of a full
  * sort per group. Ordering ties break on the lower id, making results
  * deterministic (and oracle-comparable against a row_number window).
  *
  * Buffer is a sorted List (descending score, ascending id) capped at k;
  * for the small k of ANN queries the O(k) insert beats heap constant
  * factors and encodes cheaply.
  */
final case class ScoredId(score: Double, id: Long)

class TopKAgg(k: Int) extends Aggregator[ScoredId, List[ScoredId], List[ScoredId]] {

  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  override def zero: List[ScoredId] = Nil

  override def reduce(buf: List[ScoredId], a: ScoredId): List[ScoredId] =
    insert(buf, a)

  override def merge(b1: List[ScoredId], b2: List[ScoredId]): List[ScoredId] =
    b2.foldLeft(b1)(insert)

  private def insert(buf: List[ScoredId], a: ScoredId): List[ScoredId] = {
    if (buf.lengthCompare(k) >= 0 && ord.gteq(a, buf.last)) buf
    else {
      val (before, after) = buf.span(ord.lt(_, a))
      (before ::: a :: after).take(k)
    }
  }

  override def finish(reduction: List[ScoredId]): List[ScoredId] = reduction

  override def bufferEncoder: Encoder[List[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[ScoredId]]()

  override def outputEncoder: Encoder[List[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[ScoredId]]()
}
