package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.functions.{NormTokens, TextFns}

/** The one-pass clean+tokenize kernel must produce EXACTLY the composed
  * regex pipeline's arrays — tokens(clean(text)) — which is also what
  * the DuckDB oracle CTEs encode. Checked property-style over adversarial
  * strings (unicode, control bytes, all-punctuation, long ws runs) plus
  * the real testdata corpus.
  */
class NormTokensSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def viaSpark(texts: Seq[Option[String]]): (Seq[Seq[String]], Seq[Seq[String]]) = {
    import spark.implicits._
    val df = texts.toDF("text").select(
      TextFns.tokens(TextFns.cleanRegex(col("text"))).as("regex_tok"),
      NormTokens.column(col("text")).as("kernel_tok"))
    val rows = df.collect()
    (rows.map(_.getSeq[String](0)).toSeq, rows.map(_.getSeq[String](1)).toSeq)
  }

  test("kernel == regex pipeline on adversarial fixed cases") {
    val cases: Seq[Option[String]] = Seq(
      None, Some(""), Some(" "), Some("\t\n\f\r"), Some("a"),
      Some("Hello, World!"), Some("a,b c;d"), Some("  leading and  runs  "),
      Some("ALL CAPS AND lower"), Some("digits123between456words"),
      Some("unicode éè café 中文 mixed"),
      Some("nbsp\u00A0between\u00A0words"),
      Some("emoji 😀 inside"), Some("...!!!???"),
      Some("tab\tsep\nnewline\rcarriage"), Some("x" * 5000),
      Some(("word " * 2000).trim))
    val (regex, kernel) = viaSpark(cases)
    regex.zip(kernel).zipWithIndex.foreach { case ((r, k), i) =>
      assert(r == k, s"case $i: $r != $k")
    }
  }

  test("kernel == regex pipeline on random unicode strings") {
    // small alphabet mixing letters, ws, punct, digits, multibyte chars
    val alphabet = Gen.oneOf(
      Gen.alphaChar, Gen.oneOf(' ', '\t', '\n', ',', '.', '!', '0', '9'),
      Gen.oneOf('é', '中', ' ', ' '))
    val strGen = Gen.chooseNum(0, 80).flatMap(n => Gen.stringOfN(n, alphabet))
    val batch = Gen.listOfN(200, strGen).sample.get.map(Option(_))
    val (regex, kernel) = viaSpark(batch)
    regex.zip(kernel).zip(batch).foreach { case ((r, k), src) =>
      assert(r == k, s"input ${src.get.map(_.toInt)}: $r != $k")
    }
  }

  test("kernel == regex pipeline on the whole sf0.001 corpus") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val n = docs.filter(
      !(TextFns.tokens(TextFns.cleanRegex(col("text"))) <=>
        NormTokens.column(col("text")))).count()
    assert(n == 0)
  }

  test("runs inside whole-stage codegen; null text -> empty array") {
    val plan = spark.range(20)
      .select(concat(lit("a b "), col("id").cast("string")).as("text"))
      .select(NormTokens.column(col("text")).as("tok"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_norm_tokens") && l.trim.matches("""^[+-]*\s*\*\(\d+\).*""")),
      plan.take(600))
    import spark.implicits._
    val r = Seq((1, None: Option[String]), (2, Some("One two!")))
      .toDF("id", "text")
      .select(NormTokens.column(col("text")).as("tok")).orderBy(lit(1))
      .collect()
    val byId = Seq(r(0), r(1))
    assert(byId.exists(_.getSeq[String](0) == Seq.empty))
    assert(byId.exists(_.getSeq[String](0) == Seq("one", "two")))
  }
}
