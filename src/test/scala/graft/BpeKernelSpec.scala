package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.functions.BpeRunCount

/** The one-pass BPE run-count kernel must produce EXACTLY
  * size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+',
  * 0)) — the regex lineage it replaced and what the DuckDB oracle still
  * encodes. Checked over adversarial strings (unicode multi-byte,
  * class transitions, whitespace-only, long runs) plus the real corpus.
  */
class BpeKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def compare(texts: Seq[Option[String]]): Unit = {
    import spark.implicits._
    val rows = texts.toDF("text")
      .select(
        size(expr(
          "regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]+', 0)"))
          .as("r"),
        BpeRunCount.column(lower(col("text"))).as("k"))
      .collect()
    rows.zip(texts).foreach { case (row, src) =>
      assert(row.isNullAt(0) == row.isNullAt(1),
        s"null mismatch for $src: $row")
      if (!row.isNullAt(0))
        assert(row.getInt(0) == row.getInt(1),
          s"input $src (${src.map(_.map(_.toInt))}): " +
            s"regex=${row.getInt(0)} kernel=${row.getInt(1)}")
    }
  }

  test("kernel == regex on adversarial fixed cases") {
    compare(Seq(
      None, Some(""), Some(" "), Some("\t\n\f\r"), Some("a"), Some("A"),
      Some("abc123"), Some("ab!cd"), Some("a b c"), Some("a1!b2?c3."),
      Some("...!!!"), Some("123 456"), Some("MiXeD CaSe 42!"),
      Some("unicode éè café 中文 mixed"), Some("emoji 😀 inside"),
      Some("a,b;c.d:e"), Some("  lead  trail  "), Some("x" * 4000),
      Some(("ab1! " * 500).trim), Some(" nbsp "),
      Some("punct😀mix7z")))
  }

  test("kernel == regex on random strings over all byte classes") {
    val alphabet = Gen.oneOf(
      Gen.alphaChar, Gen.numChar,
      Gen.oneOf(' ', '\t', '\n', '\r', '\f'),
      Gen.oneOf('!', ',', '.', '?', ';', '#'),
      Gen.oneOf('é', '中', '\ud83d', 'ß')) // lone surrogate: worst-case bytes
    val strGen = Gen.chooseNum(0, 60).flatMap(n => Gen.stringOfN(n, alphabet))
    compare(Gen.listOfN(300, strGen).sample.get.map(Option(_)))
  }

  test("kernel == regex on the whole sf0.001 corpus") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val n = docs.filter(
      !(size(expr(
        "regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]+', 0)"))
        <=> BpeRunCount.column(lower(col("text")))))
      .count()
    assert(n == 0)
  }
}
