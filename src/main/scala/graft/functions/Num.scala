package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-deterministic numeric aggregation helpers.
  *
  * Double summation is order-dependent, and Spark (partial aggs over 32
  * partitions) and DuckDB (its own morsel order) will not sum in the same
  * order. The testdata's monetary/measure doubles carry <= 4 decimal
  * digits, so we sum them exactly as DECIMAL(18,4) (order-independent) and
  * cast the final result back to DOUBLE — bit-identical across engines.
  * Each Spark helper has a DuckDB SQL twin used verbatim in oracle SQL.
  */
object Num {
  private val D = DecimalType(18, 4)

  /** Exact, order-independent sum of a <=4-decimal double column. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast(DoubleType)
  def dsumSql(e: String): String =
    s"CAST(sum(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"

  /** Exact sum of a product of two <=4-decimal doubles. */
  def dsumProd(a: Column, b: Column): Column =
    sum(a.cast(D) * b.cast(D)).cast(DoubleType)
  def dsumProdSql(a: String, b: String): String =
    s"CAST(sum(CAST($a AS DECIMAL(18,4)) * CAST($b AS DECIMAL(18,4))) AS DOUBLE)"

  /** Order-independent mean: exact decimal sum divided by count. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))
  def davgSql(e: String): String = s"${dsumSql(e)} / count(*)"
}
