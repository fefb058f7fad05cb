package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: the co-located-join strategy for repeated fact-fact joins
  * at scale. Writing both sides bucketed+sorted on the join key lets the
  * SortMergeJoin read buckets directly — zero Exchange in the join plan,
  * which at 100 TB is the difference between a network-bound and an
  * IO-bound join.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed fact-fact join plans with no shuffle") {
    val li = Tables.t(spark, TestSpark.sf0001, "lineitem")
    val ord = Tables.t(spark, TestSpark.sf0001, "orders")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      // the join inputs must come straight from bucketed scans — the only
      // allowed exchange is the post-join single-key aggregation
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"), joinPart.take(600))
      assert(joined.collect().map(_.getLong(1)).sum == li.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("hive-partitioned write prunes partitions at the scan") {
    // The layout strategy for time/category-keyed corpora at 100 TB:
    // partitionBy on the query key means a filtered read lists and scans
    // ONLY the matching directories — the scan's PartitionFilters prove
    // the pruning, and partitionCount in the scan stats confirms it.
    val out = java.nio.file.Files.createTempDirectory("part_out").toString
    def scored = Tables.t(spark, TestSpark.sf0001, "documents")
      .withColumn("sentiment", graft.sentiment.Sentiment.label(
        graft.functions.PolarityScore.polarityNative(
          graft.functions.TextFns.clean(col("text")))))
    scored.write.mode("overwrite").partitionBy("sentiment")
      .parquet(s"$out/by_sentiment")

    val read = spark.read.parquet(s"$out/by_sentiment")
      .filter(col("sentiment") === "Positive")
    val n = read.count()
    assert(n > 0)
    val scan = read.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("sentiment"), scan.take(800))
    // equal to the unpartitioned filter count
    assert(n == scored.filter(col("sentiment") === "Positive").count())
  }

  test("compaction plan is executable: written layout matches the manifest") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_compact").toFile.getAbsolutePath
    val assign = graft.queries.DocQueries
      .compactionAssignment(spark, TestSpark.sf0001)
    // execute the plan: one task per (lang, file_id) group, one file per
    // directory — the write a real compaction job would perform
    assign
      .repartition(col("lang"), col("file_id"))
      .write.mode("overwrite").partitionBy("lang", "file_id").parquet(out)
    val manifest = Registry.byName("doc_compaction_plan")
      .build(spark, TestSpark.sf0001)
      .collect()
      .map(r => (Option(r.getAs[String]("lang")).getOrElse("__NULL__"),
        r.getAs[Number]("file_id").longValue()) ->
        r.getAs[Long]("n_docs")).toMap
    // every (lang, file_id) directory exists with exactly one data file
    // holding exactly the manifest's doc count
    val produced = spark.read.parquet(out)
      .groupBy("lang", "file_id")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (Option(r.getAs[String]("lang")).getOrElse("__NULL__"),
        r.getAs[Number]("file_id").longValue()) ->
        r.getAs[Long]("n")).toMap
    assert(produced == manifest, s"produced=$produced manifest=$manifest")
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
    val leafFiles = dirs.flatMap(_.listFiles()).filter(_.isDirectory)
      .map(fd => fd -> fd.listFiles().count(_.getName.endsWith(".parquet")))
    assert(leafFiles.nonEmpty && leafFiles.forall(_._2 == 1),
      leafFiles.map { case (f, c) => s"${f.getName}:$c" }.mkString(","))
  }
}
