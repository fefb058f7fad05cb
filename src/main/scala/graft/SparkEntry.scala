package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual query surface lives in [[Registry]]; this object only
  * adapts it to the driver's Map shape.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's semantic core: clean → tokenize → lexicon polarity →
    * label thresholds → groupBy(sentiment).count()
    * (SURVEY.md §7.4 minimum slice).
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("doc_sentiment_counts")
      .build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent DuckDB SQL on the same parquet
    * tables. Omitted for ops whose values are engine-specific (e.g. HLL
    * approx counts) → driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Release every memoized + persisted shared lineage of `spark`
    * (minhash/simhash/embedding pair caches). Call between scale
    * factors or before reusing a session against rewritten input dirs;
    * Verify/Bench call it before stopping their sessions.
    */
  def clearCaches(spark: SparkSession): Unit = CacheRegistry.clear(spark)
}
