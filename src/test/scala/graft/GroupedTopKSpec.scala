package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GroupedTopK

/** The custom Catalyst operator (LogicalPlan + SparkStrategy + two-phase
  * SparkPlan): result parity against the window-function form it
  * replaces, plan shape (partial below the exchange, final above, no
  * sort/window nodes), and edge behavior (k >= group size, ties, k = 1,
  * extensions-built session).
  */
class GroupedTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // range-backed (not LocalRelation: ConvertToLocalRelation would fold
  // the plan before our strategy ever sees a shuffle): 7 groups, values
  // engineered so every group has distinct top rows plus one tie pair
  private def input = {
    import spark.implicits._
    spark.range(500).select(
      (col("id") % 7).as("g"),
      col("id").as("rid"),
      ((col("id") * 37) % 101).cast("double").as("v"))
  }

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("rid"))
    input.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  private def collectSorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("g", "rid").collect().map(_.toSeq).toSeq

  test("matches the row_number window form (k=3, desc with tiebreak)") {
    val df = input
    val got = GroupedTopK(df, Seq("g"), Seq(df("v").desc, df("rid")), 3)
    assert(collectSorted(got) == collectSorted(windowTopK(3)))
  }

  test("k = 1 and k >= group size") {
    val df = input
    val one = GroupedTopK(df, Seq("g"), Seq(df("v").desc, df("rid")), 1)
    assert(collectSorted(one) == collectSorted(windowTopK(1)))
    // every group has ~71 rows; k=500 must return the whole input
    val all = GroupedTopK(df, Seq("g"), Seq(df("v").desc, df("rid")), 500)
    assert(all.count() == 500)
  }

  test("ascending order and multi-column grouping") {
    val df = input.withColumn("g2", col("rid") % 2)
    val got = GroupedTopK(df, Seq("g", "g2"), Seq(df("v"), df("rid")), 2)
    val w = Window.partitionBy("g", "g2").orderBy(col("v"), col("rid"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
    assert(collectSorted(got) == collectSorted(want))
  }

  test("plan: partial below exchange, final above, no sort or window") {
    val in = input
    val df = GroupedTopK(in, Seq("g"), Seq(in("v").desc, in("rid")), 3)
    df.queryExecution.toRdd.count() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GroupedTopKPartial"), p.take(800))
    assert(p.contains("GroupedTopKFinal"), p.take(800))
    assert(p.contains("Exchange hashpartitioning(g"), p.take(800))
    assert(!p.contains("Window"), p.take(800))
    assert(!p.contains("Sort "), p.take(800))
    // partial must be BELOW the exchange (runs before the shuffle)
    val iPartial = p.indexOf("GroupedTopKPartial")
    val iFinal = p.indexOf("GroupedTopKFinal")
    val iExchange = p.indexOf("Exchange")
    assert(iFinal < iExchange && iExchange < iPartial,
      s"final<exchange<partial expected:\n${p.take(800)}")
  }

  test("strategy arrives via SparkSessionExtensions too") {
    // force the builder past the shared default session: with active +
    // default cleared it builds a NEW SparkSession instance on the live
    // SparkContext (getOrCreate would otherwise hand back the shared
    // session, extensions unapplied). The config-string form of
    // spark.sql.extensions only loads on SparkContext creation, so with a
    // reused context the class must arrive via withExtensions — same
    // GraftExtensions code path a fresh cluster session gets from config.
    spark.sparkContext // ensure the shared context exists first
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .appName("graft-ext-topk")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    try {
      assert(s2 ne spark, "builder must hand back a fresh session instance")
      // a fresh plan in the extensions session, NOT via the self-
      // registering API object — the strategy must come from extensions
      val df = s2.range(100).select(
        (col("id") % 3).as("g"), col("id").as("rid"))
      val plan = graft.plans.GroupedTopKPlan(
        Seq(org.apache.spark.sql.GraftSqlBridge.expression(df("g"))),
        Seq(org.apache.spark.sql.catalyst.expressions.SortOrder(
          org.apache.spark.sql.GraftSqlBridge.expression(df("rid")),
          org.apache.spark.sql.catalyst.expressions.Descending)),
        2, df.queryExecution.analyzed)
      val out = org.apache.spark.sql.GraftSqlBridge.ofRows(s2, plan)
      assert(out.count() == 6)
      assert(out.queryExecution.executedPlan.toString.contains("GroupedTopKFinal"))

      // optimizer rule: the row_number-filter-drop idiom must silently
      // re-plan into the operator in an extensions session — and return
      // exactly what the window form returns in a stock session
      val idiom = {
        val base = s2.range(300).select(
          (col("id") % 5).as("g"), col("id").as("rid"),
          ((col("id") * 13) % 83).as("v"))
        val w = Window.partitionBy("g").orderBy(col("v").desc, col("rid"))
        base.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 4).drop("rn")
      }
      val planStr = idiom.queryExecution.executedPlan.toString
      assert(planStr.contains("GroupedTopKFinal"), planStr.take(800))
      assert(!planStr.contains("Window"), planStr.take(800))
      val stock = {
        val base = spark.range(300).select(
          (col("id") % 5).as("g"), col("id").as("rid"),
          ((col("id") * 13) % 83).as("v"))
        val w = Window.partitionBy("g").orderBy(col("v").desc, col("rid"))
        base.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 4).drop("rn")
      }
      assert(idiom.orderBy("g", "rid").collect().map(_.toSeq).toSeq ==
        stock.orderBy("g", "rid").collect().map(_.toSeq).toSeq)

      // rank column KEPT -> schema depends on rn -> must NOT rewrite
      val kept = {
        val base = s2.range(100).select((col("id") % 3).as("g"), col("id").as("rid"))
        val w = Window.partitionBy("g").orderBy(col("rid"))
        base.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      }
      assert(kept.queryExecution.executedPlan.toString.contains("Window"))
    } finally {
      // do NOT stop s2 — it shares the one test SparkContext; just put the
      // shared session back as active/default for the remaining suites
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
      prior.foreach(SparkSession.setActiveSession)
    }
  }
}
