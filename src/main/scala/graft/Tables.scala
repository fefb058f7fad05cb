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
  def events(spark: SparkSession, dir: String): DataFrame =
    // memoized per (session, dir): every ev_* query calls this, and the
    // un-memoized form re-listed the directory and re-read the parquet
    // footer (driver-side schema inspection) once per query — BENCH_r05
    // charged the whole family's first-touch to ev_tumbling_5min.
    // Plan-level memo only (no persist): the 100k-row scan itself is
    // cheap, and persisting would turn the FileScan into an
    // InMemoryRelation, breaking the scan-count/pushdown plan audits in
    // PlanSpec. Dir contents are assumed immutable per CacheRegistry's
    // documented contract; tests that rewrite events.parquet in place
    // use a fresh dir or clear the registry.
    CacheRegistry.memo("tables_events", spark, dir) {
      // The NTZ→TZ cast below is value-preserving ONLY under a UTC
      // session zone; every graft entrypoint pins it, but a caller-
      // supplied session might not — set it here so events epochs can
      // never silently shift (ADVICE r5).
      spark.conf.set("spark.sql.session.timeZone", "UTC")
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
