package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pipeline.NewsPipeline
import graft.streaming.NewsStream

/** Sustained throughput of the STREAMING path — file-directory NDJSON
  * source → the shared NewsPipeline lineage → noop streaming sink — in
  * articles/second, measured over a pre-staged backlog drained with
  * Trigger.AvailableNow. Complements ThroughputBench (the same lineage
  * as one batch job): the delta between the two numbers is the
  * micro-batch machinery itself (offset tracking, per-batch planning,
  * checkpoint commits), which is exactly the overhead a capacity plan
  * for a streaming deployment needs to know. The reference's sustained
  * ingest is ~0.17 articles/s (API-bound, BASELINE.md).
  *
  * Usage: runMain graft.StreamingThroughputBench [nArticles] [nFiles]
  */
object StreamingThroughputBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(40)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage the backlog: nFiles NDJSON files (one per source partition —
    // the unit the file source parallelizes over), same rotating-tone
    // synthesis as ThroughputBench so every label branch executes
    val dir = Files.createTempDirectory("stream_tp").toFile
    val inDir = new java.io.File(dir, "in"); inDir.mkdirs()
    val ckDir = new java.io.File(dir, "ck").getAbsolutePath
    val tones = array(
      lit("markets rally on great success and strong growth today"),
      lit("terrible crisis deepens with losses fear and decline"),
      lit("weekly schedule and routine agenda items for the region"),
      lit("not very good results but no major failure either"))
    spark.range(n).select(
      col("id").cast("string").as("id"),
      concat(lit("headline "), col("id")).as("title"),
      concat(element_at(tones, (col("id") % 4 + 1).cast("int")),
        lit(" item "), col("id")).as("description"),
      lit("https://example.invalid/x").as("url"),
      lit("2024-01-01T00:00:00Z").as("publishedAt"),
      lit("en").as("lang"),
      lit("2024-01-01T00:00:00").as("fetched_at"))
      .repartition(nFiles)
      .write.mode("overwrite").json(inDir.getAbsolutePath)

    // warm the lineage codegen on a small batch-side run
    NewsPipeline.transform(
      spark.read.schema(graft.schema.NewsArticle.schema)
        .json(inDir.getAbsolutePath).limit(1000))
      .groupBy("sentiment").count().collect()

    // maxFilesPerTrigger splits the backlog into real micro-batches
    // (AvailableNow honors read limits), so per-batch planning/offset/
    // commit overhead is actually in the measurement — one giant batch
    // would understate it
    val batchFiles = math.max(1, nFiles / 5)
    val t0 = System.nanoTime()
    val q = NewsPipeline
      .transform(spark.readStream
        .schema(graft.schema.NewsArticle.schema)
        .option("maxFilesPerTrigger", batchFiles)
        .json(inDir.getAbsolutePath))
      .writeStream.format("noop").outputMode("append")
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress
    val rows = progress.map(_.numInputRows).sum
    val nBatches = progress.count(_.numInputRows > 0)

    println(f"""{"metric":"streaming_throughput","articles":$rows,"sec":$sec%.3f,"articles_per_sec":${rows / sec}%.1f,"files":$nFiles,"batches":$nBatches}""")
    spark.stop()
  }
}
