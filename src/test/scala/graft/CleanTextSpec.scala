package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.functions.{CleanText, TextFns}

/** The one-pass clean kernel must produce EXACTLY the composed regex
  * pipeline's strings — lower(regexp_replace(coalesce(text,''),
  * '[^a-zA-Z\s]', '')) — which is also what the DuckDB oracle's
  * cleanSql encodes. Checked over adversarial strings (unicode, control
  * bytes, all-punctuation, mixed case) plus the real testdata corpus.
  */
class CleanTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def viaSpark(texts: Seq[Option[String]]): (Seq[String], Seq[String]) = {
    import spark.implicits._
    val df = texts.toDF("text").select(
      TextFns.cleanRegex(col("text")).as("regex_clean"),
      CleanText.column(col("text")).as("kernel_clean"))
    val rows = df.collect()
    (rows.map(_.getString(0)).toSeq, rows.map(_.getString(1)).toSeq)
  }

  test("kernel == regex pipeline on adversarial fixed cases") {
    val cases: Seq[Option[String]] = Seq(
      None, Some(""), Some(" "), Some("\t\n\f\r"), Some("a"), Some("A"),
      Some("Hello, World!"), Some("a,b c;d"), Some("  leading and  runs  "),
      Some("ALL CAPS AND lower"), Some("digits123between456words"),
      Some("unicode éè café 中文 mixed"),
      Some("nbsp between words"),
      Some("emoji 😀 inside"), Some("...!!!???"),
      Some("tab\tsep\nnewline\rcarriage"), Some("x" * 5000),
      Some("already clean lower text"), // fast path: input reused as-is
      Some(("word " * 2000).trim))
    val (regex, kernel) = viaSpark(cases)
    regex.zip(kernel).zipWithIndex.foreach { case ((r, k), i) =>
      assert(r == k, s"case $i: '$r' != '$k'")
    }
  }

  test("kernel == regex pipeline on random unicode strings") {
    val alphabet = Gen.oneOf(
      Gen.alphaChar, Gen.oneOf(' ', '\t', '\n', ',', '.', '!', '0', '9'),
      Gen.oneOf('é', '中', ' ', ' '))
    val strGen = Gen.chooseNum(0, 80).flatMap(n => Gen.stringOfN(n, alphabet))
    val batch = Gen.listOfN(200, strGen).sample.get.map(Option(_))
    val (regex, kernel) = viaSpark(batch)
    regex.zip(kernel).zip(batch).foreach { case ((r, k), src) =>
      assert(r == k, s"input ${src.get.map(_.toInt)}: '$r' != '$k'")
    }
  }

  test("kernel == regex pipeline on the whole sf0.001 corpus") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val n = docs.filter(
      !(TextFns.cleanRegex(col("text")) <=> CleanText.column(col("text"))))
      .count()
    assert(n == 0)
  }

  test("runs inside whole-stage codegen; null text -> empty string; SQL registered") {
    val plan = spark.range(20)
      .select(concat(lit("a b "), col("id").cast("string")).as("text"))
      .select(CleanText.column(col("text")).as("tc"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_clean_text") && l.trim.matches("""^[+-]*\s*\*\(\d+\).*""")),
      plan.take(600))
    import spark.implicits._
    val r = Seq((1, None: Option[String]), (2, Some("One two!")))
      .toDF("id", "text")
      .select(CleanText.column(col("text")).as("tc"))
      .collect().map(_.getString(0)).toSet
    assert(r == Set("", "one two"))
    // SQL surface (GraftExtensions-style registration)
    val classic =
      org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
    val builder = GraftExtensions.functions
      .collectFirst { case ("graft_clean_text", _, b) => b }.get
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_clean_text", builder, "built-in")
    val viaSql = spark.sql("SELECT graft_clean_text('Mixed, CASE 42!') AS tc")
      .collect().head.getString(0)
    assert(viaSql == "mixed case ")
  }
}
