package graft.functions

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY.md §7.2's optional custom aggregate):
  * keeps the k smallest elements under `ord` per group with a bounded
  * O(k) buffer, merging partials associatively — so grouped top-k runs
  * as partial+final aggregation with map-side combine instead of a full
  * sort per group. Make `ord` a total order (break ties on a unique
  * field) and results are deterministic — oracle-comparable against a
  * row_number window.
  *
  * Buffer is a sorted List capped at k; for small k the O(k) insert
  * beats heap constant factors and encodes cheaply.
  */
class TopKByAgg[T: TypeTag](k: Int)(ord: Ordering[T])
    extends Aggregator[T, List[T], List[T]] {

  override def zero: List[T] = Nil

  override def reduce(buf: List[T], a: T): List[T] = insert(buf, a)

  override def merge(b1: List[T], b2: List[T]): List[T] =
    b2.foldLeft(b1)(insert)

  private def insert(buf: List[T], a: T): List[T] = {
    if (buf.lengthCompare(k) >= 0 && ord.gteq(a, buf.last)) buf
    else {
      val (before, after) = buf.span(ord.lt(_, a))
      (before ::: a :: after).take(k)
    }
  }

  override def finish(reduction: List[T]): List[T] = reduction

  override def bufferEncoder: Encoder[List[T]] = ExpressionEncoder[List[T]]()

  override def outputEncoder: Encoder[List[T]] = ExpressionEncoder[List[T]]()
}

/** (score, id) instance — the ANN queries' neighbour lists */
final case class ScoredId(score: Double, id: Long)

class TopKAgg(k: Int) extends TopKByAgg[ScoredId](k)(
  Ordering.by((s: ScoredId) => (-s.score, s.id)))

/** (score, term) instance — per-document top terms (TF-IDF) */
final case class ScoredTerm(score: Double, term: String)

class TopKTermAgg(k: Int) extends TopKByAgg[ScoredTerm](k)(
  Ordering.by((s: ScoredTerm) => (-s.score, s.term)))
