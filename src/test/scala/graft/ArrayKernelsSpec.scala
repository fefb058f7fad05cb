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
  test("SortedIntersectSize kernel == size(array_intersect), random + edges") {
    import spark.implicits._
    import graft.functions.SortedIntersectSize
    val rnd = new scala.util.Random(23)
    val sample: Seq[(Seq[String], Seq[String])] = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq.empty[String], Seq("a")),
      (Seq.empty[String], Seq.empty[String]),
      (Seq("x"), Seq("x"))) ++
      Seq.fill(200) {
        def s() = (0 until rnd.nextInt(60))
          .map(_ => s"g${rnd.nextInt(40)}").distinct
        (s(), s())
      }
    val rows = sample.toDF("a", "b")
      .select(
        SortedIntersectSize.column(
          array_sort(col("a")), array_sort(col("b"))).as("k"),
        size(array_intersect(col("a"), col("b"))).as("h"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
  }

  test("SortedIntersectSizeLong == size(array_intersect); hash multiset >= string intersect") {
    import spark.implicits._
    import graft.functions.SortedIntersectSizeLong
    val rnd = new scala.util.Random(29)
    val sample: Seq[(Seq[Long], Seq[Long])] = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 9L)),
      (Seq.empty[Long], Seq(1L)),
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(Long.MinValue, 0L, Long.MaxValue),
        Seq(Long.MinValue, Long.MaxValue))) ++
      Seq.fill(200) {
        def s() = (0 until rnd.nextInt(60))
          .map(_ => rnd.nextInt(40).toLong).distinct
        (s(), s())
      }
    val rows = sample.toDF("a", "b")
      .select(
        SortedIntersectSizeLong.column(
          array_sort(col("a")), array_sort(col("b"))).as("k"),
        size(array_intersect(col("a"), col("b"))).as("h"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
    // the prescreen's soundness bound: for DISTINCT string sets, the
    // multiset intersection of their (possibly colliding) hashes never
    // undercounts the true string intersection
    val strs: Seq[(Seq[String], Seq[String])] = Seq.fill(200) {
      def s() = (0 until (1 + rnd.nextInt(30)))
        .map(_ => s"t${rnd.nextInt(12)}").distinct
      (s(), s())
    }
    val bound = strs.toDF("a", "b")
      .select(
        SortedIntersectSizeLong.column(
          array_sort(expr("transform(a, x -> xxhash64(x) % 4)")),
          array_sort(expr("transform(b, x -> xxhash64(x) % 4)"))).as("ih"),
        size(array_intersect(col("a"), col("b"))).as("it"))
      .collect()
    // % 4 forces heavy collisions; the bound must still hold
    bound.foreach(r => assert(r.getInt(0) >= r.getInt(1), r))
  }

  test("GramCountSig/SigOverlapBound: bound >= true set intersection, always") {
    import spark.implicits._
    import graft.functions.{GramCountSig, SigOverlapBound}
    val rnd = new scala.util.Random(31)
    // vocab small enough to force real overlaps AND hash-bucket
    // collisions between non-shared elements
    val sample: Seq[(Seq[String], Seq[String])] =
      Seq((Seq.empty[String], Seq.empty[String]),
        (Seq("x"), Seq("x")),
        (Seq("x"), Seq("y"))) ++
        Seq.fill(300) {
          def s() = (0 until rnd.nextInt(120))
            .map(_ => s"w${rnd.nextInt(200)}").distinct
          (s(), s())
        }
    val rows = sample.toDF("a", "b")
      .select(
        SigOverlapBound.column(
          GramCountSig.column(col("a")),
          GramCountSig.column(col("b"))).as("bound"),
        size(array_intersect(col("a"), col("b"))).as("true_inter"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) >= r.getInt(1), r))
    // and the bound is TIGHT for identical sets (no self-inflation)
    val self = Seq((1 to 100).map(i => s"t$i")).toDF("a")
      .select(SigOverlapBound.column(
        GramCountSig.column(col("a")), GramCountSig.column(col("a"))).as("b"),
        size(col("a")).as("n")).collect()(0)
    assert(self.getInt(0) == self.getInt(1))
  }

  test("element-type mismatch is an analysis error, not a buffer reinterpret") {
    import spark.implicits._
    import graft.functions.{SortedIntersectSize, SortedIntersectSizeLong}
    val longs = Seq((Seq(1L, 2L), Seq(2L))).toDF("a", "b")
    val strs = Seq((Seq("a", "b"), Seq("b"))).toDF("a", "b")
    // string kernel on array<bigint> must fail analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      longs.select(SortedIntersectSize.column(col("a"), col("b")))
        .queryExecution.analyzed
    }
    // long kernel on array<string> must fail analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      strs.select(SortedIntersectSizeLong.column(col("a"), col("b")))
        .queryExecution.analyzed
    }
    // max-multiplicity on array<bigint> must fail analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      longs.select(MaxMultiplicity.column(col("a")))
        .queryExecution.analyzed
    }
  }

  test("SortedIntersectSize: null array -> null") {
    import spark.implicits._
    import graft.functions.SortedIntersectSize
    val df = Seq(
      (1, Seq("a", "b"), Seq("b")),
      (2, null.asInstanceOf[Seq[String]], Seq("b"))).toDF("id", "a", "b")
    val got = df.select(col("id"),
      SortedIntersectSize.column(col("a"), col("b")).as("k"))
      .orderBy("id").collect()
    assert(got(0).getInt(1) == 1)
    assert(got(1).isNullAt(1))
  }
}
