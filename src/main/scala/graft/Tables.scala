package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * 4.1 rejects outright ([PARQUET_TYPE_ILLEGAL]) unless
    * spark.sql.legacy.parquet.nanosAsLong surfaces it as a nanosecond
    * LongType. Normalize to a micro-precision TimestampType column so
    * every downstream query sees one shape. The DuckDB oracle reads full
    * nanos, so oracle SQL must truncate ts to micros (or coarser) before
    * comparing.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(spark, dir, "events")
    df.schema("ts").dataType match {
      // integral `div`, not `/`: epoch nanos (~1.7e18) overflow double precision
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => df
    }
  }
}
