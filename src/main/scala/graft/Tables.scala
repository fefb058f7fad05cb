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

  /** `name` spread to shuffle width and PERSISTED — the build-side
    * parallelism shim for MEMOIZED corpus lineages only (minhash
    * signatures, the AllPairs gram index, winnow fingerprints, the
    * vocabulary tf table). The testdata files are single-row-group
    * parquet, so a scan is one unsplittable task and a per-row kernel
    * directly above it runs single-threaded; worse, a bare
    * repartition-then-compute does NOT fix it because Catalyst pushes
    * deterministic Projects through Repartition, sinking the compute
    * back below the exchange (measured on the 10x probe: the whole
    * tokenize in 3 scan tasks, twice). A PERSISTED exchange is a
    * boundary no projection crosses. Scope discipline: per-query plans
    * stay scan-shaped — at 100 TB the scan arrives pre-split across
    * thousands of files and repartitioning raw text would be a full
    * corpus shuffle for nothing; only one-time index builds (which a
    * production pipeline stages from many files anyway) read this.
    */
  def spread(spark: SparkSession, dir: String, name: String): DataFrame =
    CacheRegistry.memo(s"tables_spread_$name", spark, dir)(
      CacheRegistry.track(spark,
        t(spark, dir, name).repartition(
          spark.conf.get("spark.sql.shuffle.partitions").toInt)))
}
