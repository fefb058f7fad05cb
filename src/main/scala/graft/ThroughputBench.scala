package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.NewsPipeline

/** Engine-side throughput of the full news sentiment pipeline
  * (project → clean → filter → combine → score → label → final project)
  * over synthesized articles, reported as articles/second. The reference
  * system's sustained ingest is ~0.17 articles/s (GNews-API-bound,
  * BASELINE.md); this measures what the engine itself sustains.
  *
  * Usage: runMain graft.ThroughputBench [nArticles]
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // synthesize articles: rotating tone so all label branches execute
    val tones = array(
      lit("markets rally on great success and strong growth today"),
      lit("terrible crisis deepens with losses fear and decline"),
      lit("weekly schedule and routine agenda items for the region"),
      lit("not very good results but no major failure either"))
    val raw = spark.range(n).select(
      col("id").cast("string").as("id"),
      concat(lit("headline "), col("id")).as("title"),
      concat(element_at(tones, (col("id") % 4 + 1).cast("int")),
        lit(" item "), col("id")).as("description"),
      lit("https://example.invalid/x").as("url"),
      lit("2024-01-01T00:00:00Z").as("publishedAt"),
      lit("en").as("lang"),
      lit("2024-01-01T00:00:00").as("fetched_at"))

    // warm
    NewsPipeline.transform(raw.limit(10000)).groupBy("sentiment").count()
      .collect()

    val t0 = System.nanoTime()
    val counts = NewsPipeline.transform(raw)
      .groupBy("sentiment").count().collect()
    val sec = (System.nanoTime() - t0) / 1e9
    val summary = counts.map(r => s"${r.getString(0)}:${r.getLong(1)}")
      .sorted.mkString(",")
    println(f"""{"metric":"news_pipeline_throughput","articles":$n,"sec":$sec%.3f,"articles_per_sec":${n / sec}%.0f,"labels":"$summary"}""")
    spark.stop()
  }
}
