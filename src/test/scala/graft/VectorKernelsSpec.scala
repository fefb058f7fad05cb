package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{LshSig, VecDot, VecL2Sq}

/** The native vector kernels must be bit-identical to the HOF/SQL fold
  * the DuckDB oracle expresses (in-order double accumulation). Inputs
  * come from the real embeddings table so the comparison covers actual
  * float data, not toy values.
  */
class VectorKernelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val pairs = {
    val e = Tables.t(spark, TestSpark.sf0001, "embeddings")
    val a = e.filter(col("vec_id") < 30)
      .select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = e.filter(col("vec_id") >= 30 && col("vec_id") < 60)
      .select(col("vec_id").as("ib"), col("embedding").as("vb"))
    a.crossJoin(b)
  }

  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("VecDot == the in-order aggregate(zip_with) fold, bit for bit") {
    val rows = pairs.select(
      VecDot.column(col("va"), col("vb")).as("k"),
      hofDot(col("va"), col("vb")).as("h")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r))
  }

  test("VecL2Sq == the in-order squared-difference fold, bit for bit") {
    // double-typed second operand, as in the IVF centroid distance
    val withC = pairs.withColumn("vc",
      transform(col("vb"), x => x.cast("double")))
    val rows = withC.select(
      VecL2Sq.column(col("va"), col("vc")).as("k"),
      aggregate(zip_with(col("va"), col("vc"),
        (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
        lit(0.0), (acc, x) => acc + x).as("h")).collect()
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r))
  }

  test("VecCosine == the compose-of-dots form, bit for bit") {
    def hofNorm(a: org.apache.spark.sql.Column) = sqrt(hofDot(a, a))
    val composed = {
      val den = hofNorm(col("va")) * hofNorm(col("vb"))
      when(den === 0.0, 0.0).otherwise(hofDot(col("va"), col("vb")) / den)
    }
    val rows = pairs.select(
      graft.functions.VecCosine.column(col("va"), col("vb")).as("k"),
      composed.as("h")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r))
    // zero-norm convention
    import spark.implicits._
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(graft.functions.VecCosine.column(col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(z == 0.0)
  }

  test("ragged and null-element arrays yield NULL, matching the HOF fold") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(3.0f)),          // length mismatch
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)))    // clean
      .toDF("a", "b")
      .union(Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f))).toDF("a", "b")
        .select(col("a"), array(col("b")(0), lit(null).cast("float")).as("b")))
    val rows = df.select(VecDot.column(col("a"), col("b"))).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) == 11.0)
    assert(rows(2).isNullAt(0))
  }

  test("LshSig == the per-plane HOF sign dots (all LshSig.Bits planes)") {
    val e = Tables.t(spark, TestSpark.sf0001, "embeddings")
    val hofSig = (0 until LshSig.Bits).map { j =>
      val dotJ = aggregate(
        transform(sequence(lit(1), lit(64)), i =>
          element_at(col("embedding"), i).cast("double") *
            ((((i * (73 + j * 31) + lit(j * 151)) % 997) % 5) - 2)
              .cast("double")),
        lit(0.0), (a, x) => a + x)
      when(dotJ >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    val rows = e.select(LshSig.column(col("embedding")).as("k"),
      hofSig.as("h")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
    // the sign bit (plane 31) must actually fire on real data for the
    // widened signature to be exercised end to end
    assert(rows.exists(_.getInt(0) < 0))
  }

  test("LshSig yields NULL for ragged or null-element input (registered-function contract)") {
    import spark.implicits._
    val df = Seq(Array.fill(63)(0.5f), Array.fill(64)(0.5f)).toDF("v")
      .union(Seq(Array.fill(64)(0.5f)).toDF("v")
        .select(concat(slice(col("v"), 1, 63),
          array(lit(null).cast("float"))).as("v")))
    val rows = df.select(LshSig.column(col("v"))).collect()
    assert(rows(0).isNullAt(0))   // 63 dims
    assert(!rows(1).isNullAt(0))  // clean 64 dims
    assert(rows(2).isNullAt(0))   // null element
  }

  test("SqQDot/SqMaxAbs match the column-form quantizer bit-for-bit") {
    // the HOF lineage the kernels replace: ma = array_max(abs), code_i
    // = round(x*127/ma) int-cast, qdot = sum(code*qcode) — evaluated
    // here exactly as EmbQueries.sqCodes wrote it, against real data
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val codes = e
      .withColumn("ma",
        when(size(col("embedding")) === 64 &&
          !exists(col("embedding"), x => x.isNull),
          array_max(transform(col("embedding"),
            x => abs(x.cast("double"))))))
      .withColumn("code",
        when(col("ma").isNull, lit(null))
          .when(col("ma") === 0d,
            transform(col("embedding"), _ => lit(0)))
          .otherwise(transform(col("embedding"),
            x => round(x.cast("double") * 127 / col("ma"), 0)
              .cast("int"))))
      .filter(col("code").isNotNull)
    val q = codes.filter(col("vec_id") === 0)
      .select(col("code").as("qcode"))
    val rows = e.crossJoin(broadcast(q))
      .withColumn("hof_ma",
        when(size(col("embedding")) === 64 &&
          !exists(col("embedding"), x => x.isNull),
          array_max(transform(col("embedding"),
            x => abs(x.cast("double"))))))
      .withColumn("hof_qdot",
        when(col("hof_ma").isNull, lit(null).cast("long"))
          .otherwise(aggregate(
            zip_with(
              when(col("hof_ma") === 0d,
                transform(col("embedding"), _ => lit(0)))
                .otherwise(transform(col("embedding"),
                  x => round(x.cast("double") * 127 / col("hof_ma"), 0)
                    .cast("int"))),
              col("qcode"), (x, y) => (x * y).cast("long")),
            lit(0L), (acc, x) => acc + x)))
      .select(col("hof_ma"), col("hof_qdot"),
        graft.functions.SqMaxAbs.column(col("embedding")).as("k_ma"),
        graft.functions.SqQDot.column(col("embedding"), col("qcode"))
          .as("k_qdot"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(2), r)
      assert(r.isNullAt(1) == r.isNullAt(3), r)
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(2), r)
      if (!r.isNullAt(1)) assert(r.getLong(1) == r.getLong(3), r)
    }
  }

  test("SqQDot NULL contract: ragged and null-element vectors are excluded") {
    import spark.implicits._
    val qcode = array((0 until 64).map(i => lit(i % 5 - 2)): _*)
    val df = Seq(Array.fill(63)(0.5f), Array.fill(64)(0.5f),
        Array.fill(64)(0.0f)).toDF("v")
      .union(Seq(Array.fill(64)(0.5f)).toDF("v")
        .select(concat(slice(col("v"), 1, 63),
          array(lit(null).cast("float"))).as("v")))
    val rows = df.select(
      graft.functions.SqQDot.column(col("v"), qcode).as("d"),
      graft.functions.SqMaxAbs.column(col("v")).as("m")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1)) // 63 dims
    assert(!rows(1).isNullAt(0))                       // clean
    assert(!rows(2).isNullAt(0) && rows(2).getLong(0) == 0L) // ma = 0
    assert(rows(3).isNullAt(0) && rows(3).isNullAt(1)) // null element
  }

  test("SignBits == the aggregate(transform) SQL form on adversarial inputs") {
    import spark.implicits._
    def half(lo: Int, hi: Int, base: Int): String =
      s"aggregate(transform(sequence($lo, $hi), i -> " +
        s"IF(try_element_at(v, i) > CAST(0 AS FLOAT), " +
        s"shiftleft(CAST(1 AS BIGINT), i - $base), " +
        s"CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, x) -> a + x)"
    // corpus vectors + adversarial shapes: ragged (32-dim), empty,
    // all-zero (v > 0 false at exactly 0), a null element mid-array,
    // NaN (Spark float ordering treats it as largest -> bit SET),
    // negative-only, and a NULL array
    val rnd = new scala.util.Random(42)
    val synth = Seq(
      Array.fill(32)(rnd.nextFloat() - 0.5f),
      Array.empty[Float],
      Array.fill(64)(0.0f),
      Array.fill(64)(-1.0f),
      Array.tabulate(64)(i => if (i == 7) Float.NaN else -1.0f))
      .toDF("v")
      .union(Seq(Array.fill(64)(0.5f)).toDF("v")
        .select(concat(slice(col("v"), 1, 40),
          array(lit(null).cast("float")),
          slice(col("v"), 42, 23)).as("v")))
      .union(Seq(1).toDF("x").select(lit(null).cast("array<float>").as("v")))
    val corpus = Tables.t(spark, TestSpark.sf0001, "embeddings")
      .filter(col("vec_id") < 100).select(col("embedding").as("v"))
    val rows = synth.union(corpus).select(
      graft.functions.SignBits.column(col("v")).as("k"),
      expr(half(1, 32, 1)).as("h1"),
      expr(half(33, 64, 33)).as("h2")).collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      val k = r.getSeq[Long](0)
      assert(k.length == 2, r)
      assert(k(0) == r.getLong(1) && k(1) == r.getLong(2), r)
    }
  }

  test("IntDot == the aggregate(zip_with) SQL form on adversarial inputs") {
    import spark.implicits._
    // int code pairs: normal, negative-heavy, extremes (+-127 at
    // 64 dims stays far from Long overflow), ragged (zip_with
    // null-pads -> NULL sum, kernel returns NULL), a null element,
    // and NULL arrays on either side
    val rnd = new scala.util.Random(7)
    def codes(n: Int): Array[Int] =
      Array.fill(n)(rnd.nextInt(255) - 127)
    val synth = Seq(
      (codes(64), codes(64)),
      (Array.fill(64)(-127), Array.fill(64)(127)),
      (Array.fill(64)(127), Array.fill(64)(127)),
      (codes(32), codes(64)),
      (Array.empty[Int], Array.empty[Int]))
      .toDF("a", "b")
      .union(Seq((codes(64), codes(64))).toDF("a", "b")
        .select(col("a"),
          concat(slice(col("b"), 1, 10), array(lit(null).cast("int")),
            slice(col("b"), 12, 53)).as("b")))
      .union(Seq(1).toDF("x").select(
        lit(null).cast("array<int>").as("a"),
        array(lit(1), lit(2)).as("b")))
    val rows = synth.select(
      graft.functions.IntDot.column(col("a"), col("b")).as("k"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS BIGINT) * y), " +
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("sql")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r)
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1), r)
    }
    // the extremes row really exercises magnitude: 64 * 127 * 127
    assert(rows.exists(r => !r.isNullAt(0) && r.getLong(0) == 64L * 127 * 127))
  }
}
