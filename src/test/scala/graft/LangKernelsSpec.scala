package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{LangMarkerCounts, LangMarkers, TextFns}

/** The single-pass language-marker kernel must count exactly like the
  * per-language `filter(tok, isin)` formulation the DuckDB oracle
  * expresses (len(list_filter(tok, x -> x IN markers))).
  */
class LangKernelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("LangMarkerCounts kernel == per-language isin filter counts") {
    import spark.implicits._
    val sample = Seq(
      Seq("the", "quick", "fox", "the", "and"), // repeats count each time
      Seq("le", "la", "y", "en", "nicht", "the"), // mixed languages
      Seq.empty[String],
      Seq("unrelated", "tokens", "only"),
      Seq("en", "en", "en"), // es marker, not en
      (1 to 300).map(i => if (i % 7 == 0) "und" else s"t$i")
    ).toDF("tok")
    val kernelCols = LangMarkers.markers.zipWithIndex.map { case ((l, _), i) =>
      element_at(LangMarkerCounts.column(col("tok")), i + 1).as(s"k_$l")
    }
    val filterCols = LangMarkers.markers.map { case (l, ws) =>
      TextFns.countIn(col("tok"), ws).as(s"f_$l")
    }
    val rows = sample.select(kernelCols ++ filterCols: _*).collect()
    val n = LangMarkers.markers.size
    rows.foreach { r =>
      (0 until n).foreach(i => assert(r.getInt(i) == r.getInt(n + i), r))
    }
  }

  test("kernel runs inside whole-stage codegen, null token array -> null") {
    val plan = spark.range(50)
      .select(array(concat(lit("t"), col("id").cast("string"))).as("tok"))
      .select(LangMarkerCounts.column(col("tok")).as("mc"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_lang_counts") && l.trim.matches("""^[+-]*\s*\*\(\d+\).*""")),
      plan.take(600))
    import spark.implicits._
    val r = Seq((1, None: Option[Seq[String]]), (2, Some(Seq("the"))))
      .toDF("id", "tok")
      .select(LangMarkerCounts.column(col("tok")).as("mc")).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getSeq[Int](0) == Seq(1, 0, 0, 0))
  }
}
