package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MaxMultiplicity

class ArrayKernelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** the HOF composition the kernel replaces (and the oracle still uses) */
  private def hofForm(c: org.apache.spark.sql.Column) =
    coalesce(array_max(transform(array_distinct(c), b =>
      size(filter(c, x => x === b)))), lit(0))

  test("MaxMultiplicity kernel == the HOF composition, incl. edges") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val sample: Seq[Seq[String]] = Seq(
      Seq("a", "b", "a", "a", "c"),
      Seq("x"),
      Seq.empty[String],
      Seq("t", "t", "t", "t"),
      (1 to 500).map(i => s"w${i % 37}")) ++
      Seq.fill(100)(Seq.fill(rnd.nextInt(40))(s"g${rnd.nextInt(12)}"))
    val rows = sample.toDF("arr")
      .select(MaxMultiplicity.column(col("arr")).as("k"),
        hofForm(col("arr")).as("h"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
  }

  test("null array -> null; null elements skipped; codegen") {
    import spark.implicits._
    val df = Seq(
      (1, Seq[String]("a", "a")),
      (2, null.asInstanceOf[Seq[String]])).toDF("id", "arr")
    val got = df.select(col("id"), MaxMultiplicity.column(col("arr")).as("k"))
      .orderBy("id").collect()
    assert(got(0).getInt(1) == 2)
    assert(got(1).isNullAt(1))
    // null elements: [null, 'a', null] -> 1, not 2
    val k = df.sparkSession.range(1)
      .select(MaxMultiplicity.column(
        array(lit(null).cast("string"), lit("a"), lit(null).cast("string"))))
      .collect()(0).getInt(0)
    assert(k == 1)
    val plan = spark.range(50)
      .select(array(col("id").cast("string"), lit("z")).as("arr"))
      .select(MaxMultiplicity.column(col("arr")).as("k"))
      .queryExecution.executedPlan.toString
    // `*(n)` is the whole-stage-codegen span marker in the plan string
    assert(plan.contains("*(1)"), plan.take(400))
  }
}
