package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{HashKernels, MinHashShingleSig, MinHashSig, SimHash64}

/** The native hash kernels must be BIT-IDENTICAL to the SQL-expression
  * formulation the DuckDB oracle checks (positional hex arithmetic over
  * md5). These tests evaluate both on the same session and compare, so
  * the kernels can never drift from the oracle semantics.
  */
class HashKernelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val hex8of = (off: Int) => (1 to 8).map(k =>
    s"(locate(substring(x, ${off + k}, 1), '0123456789abcdef') - 1) * ${1L << (4 * (8 - k))}L")
    .mkString("(", " + ", ")")

  private def sample = {
    import spark.implicits._
    Seq(
      Seq("the", "quick", "brown", "fox"),
      Seq("a"),
      Seq.empty[String],
      Seq("repeat", "repeat", "repeat", "other"),
      Seq("unicode", "café", "zürich", "中文", "emojié"),
      (1 to 500).map(i => s"tok$i")
    ).toDF("tok")
  }

  test("SimHash64 kernel == the oracle's per-bit hex-arithmetic fold") {
    val bitCounts = (arr: String) =>
      s"""aggregate($arr, array_repeat(bigint(0), 32),
         |  (acc, v) -> zip_with(acc, sequence(0, 31),
         |    (a, b) -> a + ((v >> b) & 1) * 2 - 1))""".stripMargin
    val withVals = sample
      .withColumn("m", expr("transform(tok, t -> md5(t))"))
      .withColumn("cl", expr(bitCounts(s"transform(m, x -> ${hex8of(0)})")))
      .withColumn("ch", expr(bitCounts(s"transform(m, x -> ${hex8of(8)})")))
    val fp = (0 until 64).map { b =>
      val (arr, idx) = if (b < 32) ("cl", b + 1) else ("ch", b - 31)
      when(element_at(col(arr), idx) >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val rows = withVals
      .select(
        SimHash64.column(col("tok")).as("kernel"),
        when(size(col("tok")) > 0, fp).otherwise(lit(0L)).as("sqlform"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
    assert(rows(2).getLong(0) == 0L) // empty array pins to 0
  }

  test("MinHash16 kernel == the oracle's affine-min hex-arithmetic fold") {
    val hexToLong12 = (1 to 12).map(k =>
      s"(locate(substring(x, $k, 1), '0123456789abcdef') - 1) * ${1L << (4 * (12 - k))}L")
      .mkString("(", " + ", ")")
    val P = HashKernels.P
    val withSv = sample.filter(size(col("tok")) > 0)
      .withColumn("sv", expr(
        s"transform(tok, s -> ${hexToLong12.replace("x", "substring(md5(s), 1, 12)")} % ${P}L)"))
    val mins = (0 until 16).map(i =>
      array_min(transform(col("sv"),
        v => (v * (2L * i + 3) + (104729L * i + 12345)) % P)).as(s"m$i"))
    val rows = withSv
      .select(MinHashSig.column(col("tok")).as("kernel") +: mins: _*)
      .collect()
    rows.foreach { r =>
      val k = r.getSeq[Long](0)
      (0 until 16).foreach(i => assert(k(i) == r.getLong(i + 1), s"h$i of $r"))
    }
  }

  test("minhash16 yields NULL for an empty shingle array (oracle's array_min-over-empty convention)") {
    import spark.implicits._
    val rows = Seq(Seq.empty[String], Seq("one"))
      .toDF("sh").select(MinHashSig.column(col("sh")).as("m")).collect()
    assert(rows(0).isNullAt(0))
    assert(!rows(1).isNullAt(0))
  }

  test("MinHashShingleSig fused kernel == shingler + MinHashSig composition") {
    // the exact shingleCol form from DedupQueries (incl. the coalesce
    // empty/NULL branch) composed with the plain minhash kernel must
    // equal the fused kernel on every input shape
    val shingleCol = when(size(col("tok")) >= 3,
      expr("""transform(sequence(1, size(tok) - 2),
             |  i -> concat_ws(' ', tok[i-1], tok[i], tok[i+1]))""".stripMargin))
      .otherwise(array(coalesce(array_join(col("tok"), " "), lit(""))))
    val rows = sample
      .withColumn("sh", shingleCol)
      .select(
        MinHashShingleSig.column(col("tok")).as("fused"),
        MinHashSig.column(col("sh")).as("composed"))
      .collect()
    rows.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1), r)
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r)
    }
  }

  test("fused kernel == composition on 200 seeded-random token arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "word", "café", "x1", "the", "zz", "中")
    val arrays = Seq.fill(200)(
      Seq.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))))
    val shingleCol = when(size(col("tok")) >= 3,
      expr("""transform(sequence(1, size(tok) - 2),
             |  i -> concat_ws(' ', tok[i-1], tok[i], tok[i+1]))""".stripMargin))
      .otherwise(array(coalesce(array_join(col("tok"), " "), lit(""))))
    val rows = arrays.toDF("tok")
      .withColumn("sh", shingleCol)
      .select(MinHashShingleSig.column(col("tok")).as("fused"),
        MinHashSig.column(col("sh")).as("composed"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r))
  }

  test("kernels run inside whole-stage codegen") {
    // range-backed, not a local Seq: ConvertToLocalRelation would fold a
    // LocalTableScan and hide the codegen stage being asserted
    val plan = spark.range(100)
      .select(array(concat(lit("t"), col("id").cast("string"))).as("tok"))
      .select(SimHash64.column(col("tok")).as("s"),
        MinHashSig.column(col("tok")).as("m"))
      .queryExecution.executedPlan.toString
    // the *(n) prefix marks operators in a codegen stage; no UDF barrier
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_simhash64") && l.trim.matches("""^[+-]*\s*\*\(\d+\).*""")),
      plan.take(600))
    assert(!plan.contains("ScalaUDF"))
  }
}
