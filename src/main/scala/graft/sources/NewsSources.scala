package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.schema.NewsArticle

/** Batch news sources (SURVEY.md §2.1 S2–S4). The streaming source S1
  * lives in graft.streaming.NewsStream; the HTTP fetcher S5 is a
  * driver-side utility by design (reference work.py:52–82) and out of
  * engine scope — the generator in NewsStream.writeSampleBatch stands in
  * for it.
  */
object NewsSources {

  /** S2: batch NDJSON with the explicit schema (no inference pass). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(NewsArticle.schema).json(path)

  /** S3: lenient line-by-line parse — corrupt lines dropped, matching
    * the reference's skip-and-continue loop (work.py:119–132).
    */
  def readLenient(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(NewsArticle.schema)
      .option("mode", "DROPMALFORMED").json(path)

  /** S4: glob-union over a directory of heterogeneous JSON files —
    * missing columns null-backfilled (streamlit_app.py:93–115 semantics).
    * Spark's multi-file json read already unions by name against the
    * supplied schema; files whose rows lack fields yield nulls.
    */
  def readDirUnion(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(NewsArticle.schema).json(s"$dir/*.json")

  /** Round-trip source for the pipeline's own CSV sink (K5): the
    * dashboard-facing CSV written by NewsPipeline.runOnce reloads with
    * an explicit schema (header match, no inference pass — an inference
    * scan would read the data twice and can mistype sparse columns).
    * Quotes/escapes follow Spark's CSV defaults on both sides, so
    * write→read is lossless for the pipeline's string/double columns.
    */
  def readProcessedCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(graft.pipeline.NewsPipeline.processedSchema)
      .option("header", "true")
      .csv(path)
}
