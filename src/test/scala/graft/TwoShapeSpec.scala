package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** The events-`ts` lesson applied to `embeddings`: driver testdata
  * regenerations have already shipped one table under three physical
  * shapes, so the embedding kernels must survive an `array<float>` →
  * `array<double>` widening without a code change. This spec writes the
  * SAME vectors in both element types and pins that every native kernel
  * (and the Gram aggregator path) produces bit-identical results —
  * which IEEE guarantees, because per-element float→double widening is
  * exact and the kernels accumulate in double either way.
  */
class TwoShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecs: Seq[Array[Float]] = {
    val r = new scala.util.Random(42)
    (0 until 12).map { i =>
      Array.tabulate(64)(j =>
        if (i == 11) 0.0f // zero vector: the den==0 cosine branch
        else (r.nextFloat() * 2 - 1) * (1 + j % 3))
    }
  }

  private def writeShape(dir: String, asDouble: Boolean): DataFrame = {
    val elemT: DataType = if (asDouble) DoubleType else FloatType
    val rows = vecs.zipWithIndex.map { case (v, i) =>
      val arr: Seq[Any] =
        if (asDouble) v.toSeq.map(_.toDouble) else v.toSeq
      Row(i.toLong, arr)
    }
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(elemT))))
    )
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("every vector kernel is bit-identical across float and double element shapes") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-twoshape").toString
    val qcode = expr("transform(sequence(1, 64), i -> CAST(i % 7 - 3 AS INT))")
    def run(df: DataFrame): Seq[Row] = {
      val self = df.select(col("vec_id"), col("embedding").as("a"))
      val other = df.select((col("vec_id") + 1).as("oid"),
        col("embedding").as("b"))
      self.join(other, col("vec_id") === col("oid") % 12)
        .select(col("vec_id"),
          VecDot.column(col("a"), col("b")).as("dot"),
          VecCosine.column(col("a"), col("b")).as("cos"),
          VecL2Sq.column(col("a"), col("b")).as("l2"),
          LshSig.column(col("a")).as("sig"),
          SqMaxAbs.column(col("a")).as("ma"),
          SqQDot.column(col("a"), qcode).as("qd"))
        .orderBy("vec_id")
        .collect().toSeq
    }
    val f = run(writeShape(s"$base/f", asDouble = false))
    val d = run(writeShape(s"$base/d", asDouble = true))
    assert(f == d)
    // and the values are real (a broken shape branch nulling everything
    // would pass a bare equality)
    assert(f.exists(r => !r.isNullAt(1) && r.getDouble(1) != 0.0))
  }

  test("GramAgg over the widening cast is shape-independent") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-twoshape-gram").toString
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val gram = udaf(new GramAgg(), ExpressionEncoder[Array[Double]]())
    def g(df: DataFrame): Row =
      df.agg(gram(col("embedding").cast("array<double>")).as("g"))
        .collect()(0).getAs[Row]("g")
    val gf = g(writeShape(s"$base/f", asDouble = false))
    val gd = g(writeShape(s"$base/d", asDouble = true))
    assert(gf.getAs[Long]("n") == 12 && gf == gd)
  }
}
