package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sustained throughput of the STREAMING ANN serving path — a staged
  * backlog of query-vector NDJSON files drained with
  * Trigger.AvailableNow through AnnServing.startServingSink against
  * the persisted IVF+PQ index — in query vectors/second. The index
  * build is staged before the clock starts (it is the offline
  * artifact); the measured window covers exactly what an online
  * retrieval deployment pays per batch: source listing, the broadcast
  * centroid probe, the per-batch ADC table, the directory-pruned code
  * scan, the exact rerank, and the parquet answer append.
  *
  * A 4th arg selects the channel: `ivfpq` (default) drains through
  * startServingSink; `bq` drains the same backlog through
  * startBqServingSink (the 1-bit Hamming first stage over the
  * persisted bitsig/ artifact + exact rerank); `adaptive` /
  * `adaptive_rare` drain through startAdaptiveServingSink with the
  * broad (~10%, pruned-scan arm) and rare (~1.4%, exact-prefilter
  * arm) predicates — pricing both sides of the selectivity switch;
  * `maintain` stages a
  * backlog of NEW vectors (corpus vectors under fresh ids) and drains
  * it through startAutoMaintainSink against a WORKING COPY of the
  * index — sustained upsert + skew-check + split throughput in
  * vectors/second, with the splits the run performed reported beside
  * the rate.
  *
  * Usage: runMain graft.AnnServingBench [sfDir] [nQueries] [nFiles] [channel]
  */
object AnnServingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nQ = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val nFiles = args.drop(2).headOption.map(_.toInt).getOrElse(8)
    val channel = args.drop(3).headOption.getOrElse("ivfpq")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // offline: the served index + the query backlog (vectors cycled
    // from the corpus itself, qids disjoint from vec_ids so no
    // self-exclusion interplay)
    val idx = queries.EmbQueries.ensureServedIndex(spark, sfDir)
    val vectorsPath = s"$sfDir/embeddings.parquet"
    if (channel == "maintain") { maintain(spark, idx, sfDir, nQ, nFiles); return }
    if (channel == "maintain_versioned") {
      maintainVersioned(spark, idx, sfDir, nQ, nFiles); return
    }
    // same workload with the per-batch upsert publish routed through
    // the optimistic CAS commit — prices the multi-writer safety
    // premium (a couple of driver-side FS ops per publish; expect
    // parity with maintain_versioned within noise)
    if (channel == "maintain_versioned_cas") {
      maintainVersioned(spark, idx, sfDir, nQ, nFiles, cas = true); return
    }
    if (channel == "maintain_upsert_cadence") {
      maintainUpsertCadence(spark, idx, sfDir, nQ, nFiles); return
    }
    val dir = Files.createTempDirectory("ann_tp").toFile
    val inDir = new java.io.File(dir, "in"); inDir.mkdirs()
    val emb = spark.read.parquet(vectorsPath)
    val nVec = emb.count()
    emb.select(col("vec_id"), col("embedding"))
      .crossJoin(spark.range((nQ + nVec - 1) / nVec).select(col("id").as("rep")))
      .filter(col("vec_id") + col("rep") * nVec < nQ)
      .select((col("vec_id") + col("rep") * nVec + lit(1000000000L))
        .as("qid"),
        col("embedding").as("qvec"))
      .repartition(nFiles)
      .write.mode("overwrite").json(inDir.getAbsolutePath)
    val staged = spark.read.json(inDir.getAbsolutePath).count()

    val schema = StructType(Seq(
      StructField("qid", LongType),
      StructField("qvec", ArrayType(DoubleType))))
    val outDir = new java.io.File(dir, "out").getAbsolutePath
    val ckpt = new java.io.File(dir, "ck").getAbsolutePath

    val t0 = System.nanoTime()
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", math.max(1, nFiles / 4))
      .json(inDir.getAbsolutePath)
    val q = channel match {
      case "bq" => streaming.AnnServing.startBqServingSink(
        src, idx, vectorsPath, outDir, ckpt)
      // the adaptive channels price the two arms of the
      // selectivity switch: broad (~10%) routes every batch to the
      // pruned filtered scan, rare (~1.4%) to exact pre-filter
      case "adaptive" => streaming.AnnServing.startAdaptiveServingSink(
        src, idx, vectorsPath, outDir, ckpt,
        col("label") === queries.EmbQueries.FilteredLabel)
      case "adaptive_rare" =>
        streaming.AnnServing.startAdaptiveServingSink(
          src, idx, vectorsPath, outDir, ckpt,
          col("label") === queries.EmbQueries.FilteredLabel &&
            col("vec_id") % 7 === 0)
      case _ => streaming.AnnServing.startServingSink(
        src, idx, vectorsPath, outDir, ckpt)
    }
    val drained = q.awaitTermination(600000)
    val sec = (System.nanoTime() - t0) / 1e9
    val answered = spark.read.parquet(outDir)
      .select("qid").distinct().count()
    // a timed-out stream or a partial backlog must FAIL loudly, not
    // print a plausible-looking queries/sec over whatever drained
    val error =
      if (!drained) "\"awaitTermination timed out\""
      else if (answered != staged)
        s""""answered $answered of $staged staged queries""""
      else "null"
    println(
      s"""{"metric":"ann_serving_throughput","unit":"queries_per_sec","channel":"$channel","value":${f"${answered / sec}%.1f"},"n_queries":$answered,"staged":$staged,"sec":${f"$sec%.2f"},"error":$error,"sf":"$sfDir"}""")
    CacheRegistry.clear(spark)
    spark.stop()
    if (error != "null") System.exit(1)
  }

  /** The `maintain` channel: sustained index-maintenance throughput.
    * A WORKING COPY of the served index takes the mutations (the
    * shared artifact keeps serving everything else); the arriving
    * vectors are corpus vectors under fresh ids (they assign into the
    * existing geometry, concentrating the biggest cells — the
    * skew-driving workload), staged in the id-keyed vector store as
    * the auto-maintain contract requires.
    */
  private def maintain(
      spark: SparkSession,
      idx: String,
      sfDir: String,
      nQ: Int,
      nFiles: Int): Unit = {
    val dir = Files.createTempDirectory("ann_maint_tp").toFile
    val work = new java.io.File(dir, "ix").getAbsolutePath
    val full = spark.read.parquet(s"$idx/codes")
    full.write.partitionBy("cell").parquet(s"$work/codes")
    spark.read.parquet(s"$idx/centroids").write.parquet(s"$work/centroids")
    spark.read.parquet(s"$idx/codebook").write.parquet(s"$work/codebook")
    val cellsBefore = spark.read.parquet(s"$work/centroids").count()

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nVec = emb.count()
    val fresh = emb
      .crossJoin(spark.range((nQ + nVec - 1) / nVec)
        .select(col("id").as("rep")))
      .filter(col("vec_id") + col("rep") * nVec < nQ)
      .select((col("vec_id") + col("rep") * nVec + lit(1000000000L))
        .as("vec_id"),
        col("embedding"), col("label"))
    val aug = new java.io.File(dir, "vecs").getAbsolutePath
    emb.select("vec_id", "embedding", "label").unionByName(fresh)
      .write.parquet(aug)
    val inDir = new java.io.File(dir, "in"); inDir.mkdirs()
    fresh.repartition(nFiles).write.mode("overwrite")
      .json(inDir.getAbsolutePath)
    val staged = spark.read.json(inDir.getAbsolutePath).count()

    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType)),
      StructField("label", LongType)))
    val t0 = System.nanoTime()
    val q = streaming.AnnServing.startAutoMaintainSink(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", math.max(1, nFiles / 4))
        .json(inDir.getAbsolutePath),
      work, aug, new java.io.File(dir, "ck").getAbsolutePath)
    val drained = q.awaitTermination(600000)
    val sec = (System.nanoTime() - t0) / 1e9
    spark.catalog.refreshByPath(s"$work/codes")
    val applied = spark.read.parquet(s"$work/codes")
      .filter(col("vec_id") >= 1000000000L).count()
    val cellsAfter = spark.read.parquet(s"$work/centroids").count()
    val error =
      if (!drained) "\"awaitTermination timed out\""
      else if (applied != staged)
        s""""applied $applied of $staged staged vectors""""
      else "null"
    println(
      s"""{"metric":"ann_maintain_throughput","unit":"vectors_per_sec","channel":"maintain","value":${f"${applied / sec}%.1f"},"n_vectors":$applied,"staged":$staged,"cells_before":$cellsBefore,"cells_after":$cellsAfter,"sec":${f"$sec%.2f"},"error":$error,"sf":"$sfDir"}""")
    CacheRegistry.clear(spark)
    spark.stop()
    if (error != "null") System.exit(1)
  }

  /** The `maintain_versioned` channel: the SAME staged workload as
    * `maintain`, drained through startVersionedSelfHealingSink against
    * a published v1 root — the apples-to-apples price of blue/green
    * (immutable segments + atomic manifest publishes + retention GC +
    * the per-advance depth-table refresh) over in-place mutation.
    * Reports the final published version and segment count beside the
    * rate.
    */
  private def maintainVersioned(
      spark: SparkSession,
      idx: String,
      sfDir: String,
      nQ: Int,
      nFiles: Int,
      cas: Boolean = false): Unit = {
    val dir = Files.createTempDirectory("ann_maint_ver").toFile
    val work = new java.io.File(dir, "ix").getAbsolutePath
    val full = spark.read.parquet(s"$idx/codes")
    full.write.partitionBy("cell").parquet(s"$work/codes_v1")
    spark.read.parquet(s"$idx/centroids")
      .write.parquet(s"$work/centroids_v1")
    spark.read.parquet(s"$idx/codebook").write.parquet(s"$work/codebook")
    queries.EmbQueries.publishVersion(spark, work, 1,
      s"$work/centroids_v1", s"$work/codes_v1")
    val cellsBefore = spark.read.parquet(s"$work/centroids_v1").count()

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nVec = emb.count()
    val fresh = emb
      .crossJoin(spark.range((nQ + nVec - 1) / nVec)
        .select(col("id").as("rep")))
      .filter(col("vec_id") + col("rep") * nVec < nQ)
      .select((col("vec_id") + col("rep") * nVec + lit(1000000000L))
        .as("vec_id"),
        col("embedding"), col("label"))
    val aug = new java.io.File(dir, "vecs").getAbsolutePath
    emb.select("vec_id", "embedding", "label").unionByName(fresh)
      .write.parquet(aug)
    val inDir = new java.io.File(dir, "in"); inDir.mkdirs()
    fresh.repartition(nFiles).write.mode("overwrite")
      .json(inDir.getAbsolutePath)
    val staged = spark.read.json(inDir.getAbsolutePath).count()

    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType)),
      StructField("label", LongType)))
    val depths = new java.io.File(dir, "depths.parquet").getAbsolutePath
    val t0 = System.nanoTime()
    val q = streaming.AnnServing.startVersionedSelfHealingSink(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", math.max(1, nFiles / 4))
        .json(inDir.getAbsolutePath),
      work, aug, new java.io.File(dir, "ck").getAbsolutePath,
      depthsPath = Some(depths), casPublish = cas)
    val drained = q.awaitTermination(600000)
    val sec = (System.nanoTime() - t0) / 1e9
    val (ver, centPath, codesPath) =
      queries.EmbQueries.readManifest(spark, work)
    val applied = queries.EmbQueries.readSegments(spark, codesPath)
      .filter(col("vec_id") >= 1000000000L).count()
    val cellsAfter = spark.read.parquet(centPath).count()
    val nSegs = codesPath.split(',').length
    val error =
      if (!drained) "\"awaitTermination timed out\""
      else if (applied != staged)
        s""""applied $applied of $staged staged vectors""""
      else "null"
    println(
      s"""{"metric":"ann_maintain_throughput","unit":"vectors_per_sec","channel":"${if (cas) "maintain_versioned_cas" else "maintain_versioned"}","value":${f"${applied / sec}%.1f"},"n_vectors":$applied,"staged":$staged,"cells_before":$cellsBefore,"cells_after":$cellsAfter,"final_version":$ver,"final_segments":$nSegs,"sec":${f"$sec%.2f"},"error":$error,"sf":"$sfDir"}""")
    CacheRegistry.clear(spark)
    spark.stop()
    if (error != "null") System.exit(1)
  }

  /** The `maintain_upsert_cadence` channel: the STEADY-STATE price of
    * the depth-table refresh cadence. The SAME upsert-only backlog
    * (consolidation disabled via an untrippable skew threshold — the
    * ingest-heavy regime a 100 TB stream lives in) drains through
    * startVersionedSelfHealingSink twice: EAGER (refreshEveryVersions
    * = 1 — round 12's behavior, the O(corpus) exact-truth pass on
    * every mutating batch) vs CADENCE (= 8). The wall-clock delta is
    * exactly the per-batch corpus scans the cadence removed; both
    * runs still derive on their first batch and on the compaction
    * batch (a consolidating advance), so the tables never go missing.
    */
  private def maintainUpsertCadence(
      spark: SparkSession,
      idx: String,
      sfDir: String,
      nQ: Int,
      nFiles: Int): Unit = {
    val dir = Files.createTempDirectory("ann_maint_cad").toFile
    val full = spark.read.parquet(s"$idx/codes")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nVec = emb.count()
    val fresh = emb
      .crossJoin(spark.range((nQ + nVec - 1) / nVec)
        .select(col("id").as("rep")))
      .filter(col("vec_id") + col("rep") * nVec < nQ)
      .select((col("vec_id") + col("rep") * nVec + lit(1000000000L))
        .as("vec_id"),
        col("embedding"), col("label"))
    val aug = new java.io.File(dir, "vecs").getAbsolutePath
    emb.select("vec_id", "embedding", "label").unionByName(fresh)
      .write.parquet(aug)
    val inDir = new java.io.File(dir, "in"); inDir.mkdirs()
    fresh.repartition(nFiles).write.mode("overwrite")
      .json(inDir.getAbsolutePath)
    val staged = spark.read.json(inDir.getAbsolutePath).count()
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType)),
      StructField("label", LongType)))

    def run(tag: String, refreshEvery: Int): (Double, Long, Int) = {
      val work = new java.io.File(dir, s"ix_$tag").getAbsolutePath
      full.write.partitionBy("cell").parquet(s"$work/codes_v1")
      spark.read.parquet(s"$idx/centroids")
        .write.parquet(s"$work/centroids_v1")
      spark.read.parquet(s"$idx/codebook").write.parquet(s"$work/codebook")
      queries.EmbQueries.publishVersion(spark, work, 1,
        s"$work/centroids_v1", s"$work/codes_v1")
      val depths = new java.io.File(dir, s"depths_$tag").getAbsolutePath
      val t0 = System.nanoTime()
      val q = streaming.AnnServing.startVersionedSelfHealingSink(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .json(inDir.getAbsolutePath),
        work, aug, new java.io.File(dir, s"ck_$tag").getAbsolutePath,
        depthsPath = Some(depths),
        refreshEveryVersions = refreshEvery,
        // consolidation disabled: pure upsert-only advances
        num = 1 << 20, den = 1)
      val drained = q.awaitTermination(600000)
      val sec = (System.nanoTime() - t0) / 1e9
      val (ver, _, codesPath) =
        queries.EmbQueries.readManifest(spark, work)
      val applied = queries.EmbQueries.readSegments(spark, codesPath)
        .filter(col("vec_id") >= 1000000000L).count()
      if (!drained || applied != staged)
        sys.error(s"$tag run incomplete: drained=$drained " +
          s"applied=$applied staged=$staged")
      (sec, applied, ver)
    }
    val (secEager, _, vEager) = run("eager", 1)
    val (secCad, applied, vCad) = run("cadence", 8)
    println(
      s"""{"metric":"ann_maintain_throughput","unit":"vectors_per_sec","channel":"maintain_upsert_cadence","value":${f"${applied / secCad}%.1f"},"value_eager":${f"${applied / secEager}%.1f"},"sec_cadence":${f"$secCad%.2f"},"sec_eager":${f"$secEager%.2f"},"n_vectors":$applied,"staged":$staged,"final_version_eager":$vEager,"final_version_cadence":$vCad,"error":null,"sf":"$sfDir"}""")
    CacheRegistry.clear(spark)
    spark.stop()
  }
}
