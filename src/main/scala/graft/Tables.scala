package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Historically `events.parquet` has shipped with three different `ts`
    * physical shapes across testdata regenerations:
    *   - TIMESTAMP(NANOS): Spark 4.1 rejects it ([PARQUET_TYPE_ILLEGAL])
    *     unless spark.sql.legacy.parquet.nanosAsLong surfaces it as a
    *     nanosecond LongType;
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads it as
    *     TIMESTAMP_NTZ, which cannot cast to BIGINT;
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=true): plain TimestampType.
    * Normalize all three to a micro-precision TimestampType column so
    * every downstream query sees one shape. The NTZ→TZ cast is
    * value-preserving because every session here pins the UTC timezone
    * (Verify/Bench/specs). The DuckDB oracle derives epochs from its own
    * read, so the comparison is shape-independent.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(spark, dir, "events")
    df.schema("ts").dataType match {
      // integral `div`, not `/`: epoch nanos (~1.7e18) overflow double precision
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }
  }
}
