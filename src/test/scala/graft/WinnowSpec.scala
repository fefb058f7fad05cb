package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions.{length, lit}
import org.scalatest.funsuite.AnyFunSuite

/** Pins dedup_winnow_fingerprints against an independent brute-force
  * implementation of rightmost-min winnowing (Schleimer et al.
  * SIGMOD'03): per document, every window's selection, the distinct
  * fingerprint count, the min-hash checksum, and the density bound
  * n_windows/w <= n_fp <= n_windows must all agree. The corpus is a
  * deterministic LCG word soup plus the edge shapes (empty doc,
  * 1-token doc, exactly-k-token doc) that exercise the whole-text
  * fallback and the clipped single window.
  */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Brute-force winnowing over an already-clean token list:
    * (n_grams, n_windows, selected (1-based pos, hash) set).
    */
  private def brute(toks: Seq[String], k: Int = 4, w: Int = 4)
      : (Long, Long, Set[(Int, String)]) = {
    val grams =
      if (toks.size >= k)
        (0 to toks.size - k)
          .map(i => md5hex(toks.slice(i, i + k).mkString(" ")))
      else Seq(md5hex(toks.mkString(" ")))
    val g = grams.size
    val nWin = math.max(g - (w - 1), 1)
    val sel = (0 until nWin).map { s =>
      val win = grams.slice(s, math.min(s + w, g))
      val m = win.min
      (s + win.lastIndexOf(m) + 1, m) // rightmost min, 1-based pos
    }.toSet
    (g.toLong, nWin.toLong, sel)
  }

  test("query matches brute-force winnowing, doc for doc") {
    import spark.implicits._
    var st = 12345L
    def nextInt(n: Int): Int = {
      st = st * 6364136223846793005L + 1442695040888963407L
      ((st >>> 33) % n).toInt
    }
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val rand = (0 until 60).map { id =>
      val words = (0 until nextInt(40)).map(_ => vocab(nextInt(vocab.size)))
      (id.toLong, words.mkString(" "))
    }
    val all = rand ++ Seq(
      (1000L, ""), // empty -> whole-text fallback gram of ""
      (1001L, "alpha"), // < k tokens -> fallback
      (1002L, "alpha beta gamma delta"), // exactly k -> one gram
      (1003L, "alpha alpha alpha alpha alpha alpha alpha alpha")) // ties
    val dir = java.nio.file.Files.createTempDirectory("winnow_spec").toString
    all.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = Registry.byName("dedup_winnow_fingerprints")
      .build(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == all.size) // every doc reports a row

    all.foreach { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      val (g, nw, sel) = brute(toks)
      val row = out(id)
      assert(row.getAs[Long]("n_grams") == g, s"doc $id n_grams")
      assert(row.getAs[Long]("n_windows") == nw, s"doc $id n_windows")
      assert(row.getAs[Long]("n_fp") == sel.size.toLong, s"doc $id n_fp")
      assert(row.getAs[String]("fp_checksum") == sel.map(_._2).min,
        s"doc $id fp_checksum")
      assert(row.getAs[Boolean]("bound_ok"), s"doc $id bound_ok")
      // the density guarantee itself, from the reference implementation
      assert(sel.size.toLong * 4 >= nw && sel.size.toLong <= nw,
        s"doc $id density bound")
    }
  }
}
