package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end demo of the pure-SQL surface: a user who attaches
  * `spark.sql.extensions=graft.GraftExtensions` (here: the in-JVM
  * `withExtensions` equivalent — see GroupedTopKSpec for why) and never
  * touches the Scala API gets the whole engine from `spark.sql(...)`:
  * native sentiment scoring, fingerprint/signature functions, and the
  * row_number top-k idiom silently re-planned into the bounded-state
  * GroupedTopK operator. Each SQL result is checked against the
  * DataFrame-API path computing the same thing.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** fresh extensions session on the shared context (never stopped;
    * active/default restored) — the GroupedTopKSpec recipe
    */
  private def withExtSession[A](f: SparkSession => A): A = {
    spark.sparkContext
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .appName("graft-sql-surface")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    try f(s2)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
      prior.foreach(SparkSession.setActiveSession)
    }
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  test("sentiment dashboard aggregate in pure SQL matches the DataFrame path") {
    withExtSession { s =>
      s.sql(
        s"CREATE OR REPLACE TEMP VIEW news AS SELECT * FROM " +
          s"parquet.`${TestSpark.sf0001}/documents.parquet`")
      // the reference's dashboard group-by, written the way a SQL-only
      // user would: native scorer + the published CASE thresholds
      val sql = s.sql(
        """WITH scored AS (
          |  SELECT doc_id, graft_polarity(text) AS polarity FROM news
          |)
          |SELECT
          |  CASE WHEN polarity > 0.1 THEN 'Positive'
          |       WHEN polarity < -0.1 THEN 'Negative'
          |       ELSE 'Neutral' END AS sentiment,
          |  count(*) AS n
          |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin)
      // DataFrame-API twin in the same session, via the same native
      // expression exposed as a Column
      val p = org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.PolarityScore(
          org.apache.spark.sql.GraftSqlBridge.expression(col("text"))))
      val api = s.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
        .select(graft.functions.TextFns.label(p).as("sentiment"))
        .groupBy("sentiment").agg(count(lit(1)).as("n"))
        .orderBy("sentiment")
      assert(rows(sql) == rows(api))
      assert(rows(sql).map(_.head).toSet.subsetOf(
        Set[Any]("Positive", "Negative", "Neutral")))
      // the native expression must stay inside whole-stage codegen (the
      // `*(n)` spans in the plan string) — a SQL user pays zero
      // interpretation overhead on the scan: graft_polarity sits inside
      // the same codegen stage as the scan projection + partial agg
      val plan = sql.queryExecution.executedPlan.toString
      assert(plan.contains("*(1) Project [graft_polarity"), plan.take(2000))
    }
  }

  test("keep-first dedup via the SQL row_number idiom hits GroupedTopK") {
    withExtSession { s =>
      s.sql(
        s"CREATE OR REPLACE TEMP VIEW news AS SELECT * FROM " +
          s"parquet.`${TestSpark.sf0001}/documents.parquet`")
      // the standard SQL keep-first-per-fingerprint idiom; the optimizer
      // rule must re-plan it into the bounded-state custom operator.
      // Tokenization is pure SQL (same clean/split/filter as TextFns).
      val dedup = s.sql(
        """WITH fps AS (
          |  SELECT doc_id, graft_simhash64(
          |    filter(split(lower(regexp_replace(coalesce(text, ''),
          |                                      '[^a-zA-Z\\s]', '')),
          |                 '\\s+'), x -> x <> '')) AS fp
          |  FROM news)
          |SELECT doc_id, fp FROM (
          |  SELECT doc_id, fp,
          |         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
          |  FROM fps) WHERE rn <= 1""".stripMargin)
      val planStr = {
        dedup.queryExecution.toRdd.count() // finalize adaptive plan
        dedup.queryExecution.executedPlan.toString
      }
      assert(planStr.contains("GroupedTopKFinal"), planStr.take(800))
      assert(!planStr.contains("Window"), planStr.take(800))
      // parity: same rows as the window form in the stock session
      // (where the rule is not installed)
      val stock = spark.read
        .parquet(s"${TestSpark.sf0001}/documents.parquet")
        .selectExpr("doc_id", "text")
        .withColumn("fp", org.apache.spark.sql.GraftSqlBridge.column(
          graft.functions.SimHash64(
            org.apache.spark.sql.GraftSqlBridge.expression(
              graft.functions.TextFns.tokens(
                graft.functions.TextFns.clean(col("text")))))))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("fp").orderBy("doc_id")))
        .filter(col("rn") === 1).select("doc_id", "fp")
      assert(stock.queryExecution.executedPlan.toString.contains("Window"))
      assert(rows(dedup.orderBy("doc_id")) == rows(stock.orderBy("doc_id")))
    }
  }

  test("round-6 kernels are SQL-callable: bpe runs + quantized dot") {
    withExtSession { s =>
      s.sql(s"CREATE OR REPLACE TEMP VIEW docs6 AS SELECT * FROM " +
        s"parquet.`${TestSpark.sf0001}/documents.parquet`")
      val bpe = s.sql(
        """SELECT doc_id, graft_bpe_runs(lower(text)) AS n_bpe
          |FROM docs6 ORDER BY doc_id LIMIT 5""".stripMargin).collect()
      assert(bpe.length == 5 && bpe.forall(!_.isNullAt(1)))
      s.sql(s"CREATE OR REPLACE TEMP VIEW emb6 AS SELECT * FROM " +
        s"parquet.`${TestSpark.sf0001}/embeddings.parquet`")
      // quantize the probe in SQL, dot the corpus against it in SQL —
      // the full int8 scan expressible without any Scala
      val dots = s.sql(
        """WITH probe AS (
          |  SELECT transform(embedding,
          |    x -> CAST(round(CAST(x AS DOUBLE) * 127 /
          |           graft_sq_maxabs(embedding), 0) AS INT)) AS qcode
          |  FROM emb6 WHERE vec_id = 0
          |)
          |SELECT vec_id, graft_sq_qdot(embedding, qcode) AS qdot
          |FROM emb6 CROSS JOIN probe WHERE vec_id <> 0
          |ORDER BY qdot DESC, vec_id LIMIT 5""".stripMargin).collect()
      assert(dots.length == 5 && dots.forall(!_.isNullAt(1)))
    }
  }

  test("merge kernels are SQL-callable and equal size(array_intersect)") {
    withExtSession { s =>
      val rows = s.sql(
        """SELECT
          |  graft_sorted_intersect_size(
          |    array('a','b','c'), array('b','c','d')) AS ks,
          |  graft_sorted_intersect_size_long(
          |    array(1L, 2L, 3L), array(2L, 3L, 9L)) AS kl,
          |  size(array_intersect(array('a','b','c'), array('b','c','d')))
          |    AS es""".stripMargin).collect()
      assert(rows(0).getInt(0) == 2 && rows(0).getInt(1) == 2 &&
        rows(0).getInt(2) == 2)
    }
  }

  test("vector similarity search in pure SQL matches the kernel column API") {
    withExtSession { s =>
      s.sql(
        s"CREATE OR REPLACE TEMP VIEW emb AS SELECT * FROM " +
          s"parquet.`${TestSpark.sf0001}/embeddings.parquet`")
      // brute-force cosine top-5 around one probe vector, SQL only
      val sql = s.sql(
        """WITH probe AS (
          |  SELECT embedding AS pv FROM emb WHERE vec_id = 0
          |)
          |SELECT vec_id, round(graft_cosine(embedding, pv), 6) AS sim
          |FROM emb CROSS JOIN probe
          |WHERE vec_id <> 0
          |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin)
      val embDf = s.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      val probe = embDf.filter(col("vec_id") === 0)
        .select(col("embedding").as("pv"))
      val api = embDf.crossJoin(broadcast(probe))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), round(
          org.apache.spark.sql.GraftSqlBridge.column(
            graft.functions.VecCosine(
              org.apache.spark.sql.GraftSqlBridge.expression(col("embedding")),
              org.apache.spark.sql.GraftSqlBridge.expression(col("pv")))),
          6).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(5)
      assert(rows(sql) == rows(api))
      assert(rows(sql).size == 5)
    }
  }
}
