package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registry query must build and execute at sf0.001 (the driver's
  * smoke scale). Known-cardinality queries are pinned.
  */
class RegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("no duplicate names; oracle coverage is near-total") {
    assert(Registry.byName.size == Registry.all.size)
    val noOracle = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    // only engine-specific-value ops may skip the oracle
    assert(noOracle.toSet.subsetOf(
      Set("ev_approx_distinct_users", "doc_sentiment_ml_counts")))
  }

  test("every query executes at sf0.001") {
    Registry.all.foreach { q =>
      val df = q.build(spark, dir)
      val n = df.count()
      assert(n >= 0, q.name)
      assert(df.columns.nonEmpty, q.name)
    }
  }

  test("pinned cardinalities") {
    def n(name: String): Long = Registry.byName(name).build(spark, dir).count()
    assert(n("doc_project") == 500)
    assert(n("doc_topk_longest") == 20)
    assert(n("emb_knn_cosine") == 10)
    assert(n("star_q1_pricing") == 6)
    assert(n("emb_centroid_by_label") == 640) // 10 labels x 64 dims
    assert(n("ev_distinct_users") == 1)
    assert(n("emb_ivf_ann") == 5)
    assert(n("emb_multi_knn") == 15) // 5 query vectors x top-3
    assert(n("dedup_minhash_pairs") == 28) // sf0.001's near-dup pairs
    assert(n("dedup_minhash_survivors") == 1)
    assert(n("star_pivot") == 3) // returnflag values A/N/R
    assert(n("doc_hash_split_counts") == 3) // train/val/test
    assert(n("ev_value_range_join") == 20) // one row per value band
    assert(n("dedup_split_contamination") == 1)
    assert(n("doc_tfidf_top_terms") == 1500) // 500 docs x top-3
    assert(n("emb_dim_variance") == 64) // one row per dimension
    assert(n("emb_covariance_topk") == 20) // top-20 of 2016 pairs
    assert(n("doc_mg_heavy_hitters") == 1) // single verdict row
    assert(n("doc_heavy_hitters_tworound") == 5) // certified top-5
    assert(n("ev_hll_intersection") == 1)
    assert(n("star_q2_min_cost_supplier") == 13) // argmin ties included
    assert(n("star_q13_order_distribution") == 14) // distinct c_counts
    assert(n("star_q15_top_supplier") == 1) // unique max at this sf
    assert(n("star_q22_dormant_customers") == 1)
    assert(n("doc_pipeline_funnel") == 7) // one row per funnel stage
  }

  test("pipeline funnel stages are monotone non-increasing") {
    val rows = Registry.byName("doc_pipeline_funnel").build(spark, dir)
      .orderBy("stage").collect()
    assert(rows.length == 7)
    val docs = rows.map(_.getAs[Long]("n_docs"))
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    // each stage filters the previous — survival can only shrink
    docs.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"docs grew: ${docs.mkString(",")}")
    }
    toks.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"tokens grew: ${toks.mkString(",")}")
    }
    // and the gate genuinely cuts at this sf (raw > quality survivors)
    assert(docs.head > docs(2))
  }

  // Guard against testdata-regeneration drift: the driver has shipped
  // events.ts as raw-nanos int64, TIMESTAMP(MICROS, isAdjustedToUTC=false)
  // (-> Spark TIMESTAMP_NTZ), and TIMESTAMP(MICROS, adjusted) across
  // rounds; the NTZ shape silently broke 17 queries in round 4. Pin that
  // Tables.events normalizes every shape to TimestampType with identical
  // values, and that EVERY event-time query still analyzes (the round-4
  // failure was an analysis-time CAST_WITHOUT_SUGGESTION) against an
  // NTZ-shaped table.
  test("events.ts normalizes across all three historical parquet shapes") {
    import org.apache.spark.sql.types.TimestampType
    import java.nio.file.{Files, Paths}
    val epochS = 1704067200L // 2024-01-01T00:00:00Z
    val roots = Seq("ntz", "utc", "rawlong").map { shape =>
      val dir = Files.createTempDirectory(s"evshape_$shape")
      // the non-events tables, linked so multi-table queries analyze too
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "documents", "embeddings"))
        Files.createSymbolicLink(dir.resolve(s"$t.parquet"),
          Paths.get(TestSpark.sf0001, s"$t.parquet"))
      import spark.implicits._
      val df = shape match {
        case "ntz" =>
          Seq((1L, java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0),
            7L, "click", 1.5, "{}"))
            .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        case "utc" =>
          Seq((1L, java.sql.Timestamp.from(
            java.time.Instant.ofEpochSecond(epochS)),
            7L, "click", 1.5, "{}"))
            .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        case _ =>
          Seq((1L, epochS * 1000000000L, 7L, "click", 1.5, "{}"))
            .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      }
      df.coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve("events.parquet").toString)
      shape -> dir.toString
    }
    for ((shape, dir) <- roots) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType, s"shape=$shape")
      val got = ev.select(org.apache.spark.sql.functions.col("ts")
        .cast("long")).head.getLong(0)
      assert(got == epochS, s"shape=$shape epoch=$got")
    }
    // every event-time query must at least pass analysis on the NTZ shape
    val ntzDir = roots.toMap.apply("ntz")
    Registry.all.filter(_.name.startsWith("ev_")).foreach { q =>
      val df = q.build(spark, ntzDir)
      assert(df.schema.nonEmpty, q.name) // forces analysis
    }
  }

  test("flagship entry returns data") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("driver contract maps stay consistent") {
    assert(SparkEntry.queries.keySet == Registry.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
