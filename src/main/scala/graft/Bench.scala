package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet paths once so the first measured query
    // doesn't absorb session startup (JIT, codegen compiler, FS client).
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().collect()
    var failed = List.empty[String]
    val results = SparkEntry.queries.flatMap { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        // A noop-sink write materializes EVERY column of the result, so
        // Catalyst cannot prune projected compute (UDF/expression columns)
        // or drop terminal sorts the way it can under a bare count().
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          // a failed query must be visible, not silently averaged in
          failed ::= name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    CacheRegistry.clear(spark) // no pinned storage outlives the run
    spark.stop()
  }
}
