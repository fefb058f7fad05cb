package graft

import org.apache.spark.sql.functions.{length, lit}
import org.scalatest.funsuite.AnyFunSuite

/** Pins dedup_prefix_jaccard against an independent brute-force
  * all-pairs Jaccard join. The query's DuckDB oracle implements the
  * SAME prefix-filtering algorithm (that is what makes the oracle
  * tractable over a whole corpus), so a shared algorithmic bug —
  * a too-short prefix that silently drops a qualifying pair — would
  * pass the oracle gate. This spec is the independent check of the
  * AllPairs completeness property (Bayardo et al. WWW'07): every pair
  * with bigram Jaccard >= 0.5 must survive prefix filtering, for a
  * corpus salted with near-boundary pairs (clones with 0..6 token
  * edits), exact duplicates, empty docs, and 1-token docs.
  */
class PrefixJaccardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** brute bigram set, mirroring DedupQueries.bigramSets */
  private def bigrams(toks: Seq[String]): Set[String] =
    if (toks.size >= 2)
      toks.sliding(2).map(_.mkString(" ")).toSet
    else toks.toSet

  test("prefix filtering finds exactly the brute-force pair set") {
    import spark.implicits._
    var st = 98765L
    def nextInt(n: Int): Int = {
      st = st * 6364136223846793005L + 1442695040888963407L
      ((st >>> 33) % n).toInt
    }
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")
    val base = (0 until 40).map { id =>
      val words = (0 until (4 + nextInt(20)))
        .map(_ => vocab(nextInt(vocab.size)))
      (id.toLong, words.mkString(" "))
    }
    // salted near-dups: clone a base doc, then rewrite 0..6 random
    // positions — the resulting Jaccard lands on both sides of 0.5,
    // which is where an off-by-one prefix bound would lose pairs
    val clones = (0 until 40).map { i =>
      val (_, text) = base(nextInt(base.size))
      val words = text.split(" ").toBuffer
      (0 until nextInt(7)).foreach { _ =>
        words(nextInt(words.size)) = vocab(nextInt(vocab.size))
      }
      (100L + i, words.mkString(" "))
    }
    val all = base ++ clones ++ Seq(
      (900L, ""), // empty: no grams, never pairs
      (901L, "alpha"), // 1-token fallback gram
      (902L, "alpha"), // identical 1-token doc: J=1 with 901
      (903L, "alpha beta gamma"),
      (904L, "alpha beta gamma")) // exact dup pair: J=1
    val dir =
      java.nio.file.Files.createTempDirectory("prefix_jaccard").toString
    all.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val sets = all.map { case (id, text) =>
      id -> bigrams(text.split("\\s+").filter(_.nonEmpty).toSeq)
    }
    val truth = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      uni = math.max(sa.size + sb.size - inter, 1)
      if inter * 2 >= uni
    } yield (a, b) -> BigDecimal(inter.toDouble / uni)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap

    val got = Registry.byName("dedup_prefix_jaccard").build(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double]("jaccard"))
      .toMap

    val missed = truth.keySet -- got.keySet
    val extra = got.keySet -- truth.keySet
    assert(missed.isEmpty, s"prefix filter LOST pairs: $missed")
    assert(extra.isEmpty, s"verify stage passed non-pairs: $extra")
    truth.foreach { case (k, j) =>
      assert(got(k) == j, s"pair $k jaccard ${got(k)} != brute $j")
    }
    // the corpus must actually exercise the boundary: some true pairs,
    // some rejected clones (J in (0,0.5)) — otherwise the test is vacuous
    assert(truth.nonEmpty, "no true pairs generated")
    assert(truth.contains((903L, 904L)) && truth((903L, 904L)) == 1.0)
  }
}
