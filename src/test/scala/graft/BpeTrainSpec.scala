package graft

import org.apache.spark.sql.functions.{length, lit}
import org.scalatest.funsuite.AnyFunSuite

/** Re-derives doc_bpe_train_iters in plain Scala: an independent greedy
  * BPE trainer (symbol vectors, no delimiter-string trick) over the same
  * corpus, checking each round's chosen merge, its weighted pair count,
  * and the corpus symbol totals. This is the check that the
  * replace('|a||b|') encoding really implements left-to-right
  * non-overlapping merge semantics — the corpus is salted with runs
  * ("aaaa") where overlapping and non-overlapping counts diverge.
  */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bpeRounds(terms: Map[String, Long], rounds: Int)
      : Seq[(String, String, Long, Long, Long)] = {
    var vocab: Map[Vector[String], Long] =
      terms.map { case (t, tf) => t.map(_.toString).toVector -> tf }
    def total(v: Map[Vector[String], Long]): Long =
      v.map { case (sym, tf) => sym.size * tf }.sum
    (1 to rounds).flatMap { _ =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (sym, tf) =>
        sym.sliding(2).foreach {
          case Vector(a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + tf
          case _ =>
        }
      }
      if (counts.isEmpty) None
      else {
        val ((a, b), n) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        val before = total(vocab)
        vocab = vocab.toSeq.map { case (sym, tf) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < sym.size) {
            if (i + 1 < sym.size && sym(i) == a && sym(i + 1) == b) {
              out += (a + b); i += 2 // greedy left-to-right, no overlap
            } else { out += sym(i); i += 1 }
          }
          out.toVector -> tf
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        val after = total(vocab)
        Some((a, b, n, after, before - after))
      }
    }
  }

  test("doc_bpe_train_iters == independent greedy BPE, incl. run overlap") {
    import spark.implicits._
    val docs = Seq(
      // "aaaa" -> pair (a,a) counts 3 overlapping but merges twice
      (0L, "aaaa aaaa the the the cat cat sat"),
      (1L, "the cat sat on the mat"),
      (2L, "banana bandana"),
      (3L, "a ab abc abcd"),
      (4L, ""))
    val dir = java.nio.file.Files.createTempDirectory("bpe_train").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val terms = docs.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val want = bpeRounds(terms, 3)

    val got = Registry.byName("doc_bpe_train_iters").build(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("merge_a"), r.getAs[String]("merge_b"),
        r.getAs[Long]("pair_n"), r.getAs[Long]("corpus_symbols_after"),
        r.getAs[Long]("n_applied")))
      .toSeq
    assert(got == want, s"got=$got want=$want")
    // the overlap salt really bit: round 1 must be (a,a) with
    // pair_n = 3 occurrences/doc0-token x 2 tokens ... check it merged
    // fewer times than it counted
    val r1 = got.head
    if (r1._1 == r1._2) assert(r1._5 < r1._3)
  }
}
