package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.{Q, Tables}
import graft.functions.Num._

/** Beyond-reference relational surface over the TPC-H-ish star schema
  * (SURVEY.md §7.1 step 7): multi-way joins, semi/anti joins, rollup,
  * ranking windows. Scale notes per query:
  *  - dimension tables (region/nation/supplier/part ≲ MBs even at 100 TB
  *    fact scale) are broadcast explicitly → no shuffle of the fact side;
  *  - fact-fact joins (orders ⋈ lineitem) shuffle on the join key once and
  *    aggregate with map-side partials;
  *  - all money sums are exact DECIMAL(18,4) sums (Num.dsum) so results
  *    are order-independent — safe under AQE re-planning at any scale.
  */
object StarQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.t(s, d, n)

  /** ONE builder for the scalar-max-revenue (TPC-H Q15) shape, shared
    * by `star_top_supplier` (1996 quarter) and `star_q15_top_supplier`
    * (1997 quarter) so the pair can never diverge again — round 6's
    * ReuseExchange fix initially landed in only one of the two copies.
    * Revenue stays DECIMAL through the max-match equality (a double
    * round-trip could tie-break differently per engine); the explicit
    * isNotNull(l_suppkey), mirrored in the oracle, exists for the PLAN:
    * the supplier join implies it on one branch only, which
    * de-canonicalizes the two rev subtrees and blocks ReuseExchange —
    * with it, the date-pruned scan + suppkey aggregate runs ONCE and
    * the 1-row max reuses the shuffle output (PlanSpec-pinned).
    * Returns ALL argmax suppliers on a tie — the textbook view
    * semantics.
    */
  private[queries] def topSupplierQ(name: String, lo: String, hi: String): Q =
    Q(
      name,
      (s, d) => {
        val D = DecimalType(18, 4)
        val rev = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit(lo).cast("timestamp") &&
            col("l_shipdate") < lit(hi).cast("timestamp") &&
            col("l_suppkey").isNotNull)
          .groupBy("l_suppkey")
          .agg(sum(col("l_extendedprice").cast(D) *
            (lit(1.0) - col("l_discount")).cast(D)).as("rev_dec"))
        rev.crossJoin(broadcast(rev.agg(max(col("rev_dec")).as("mr"))))
          .filter(col("rev_dec") === col("mr"))
          .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("rev_dec").cast("double").as("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some(
        s"""WITH rev AS (
           |  SELECT l_suppkey,
           |    sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
           |        CAST(1.0 - l_discount AS DECIMAL(18,4))) AS rev_dec
           |  FROM lineitem
           |  WHERE l_shipdate >= TIMESTAMP '$lo'
           |    AND l_shipdate < TIMESTAMP '$hi'
           |    AND l_suppkey IS NOT NULL
           |  GROUP BY 1)
           |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
           |FROM rev JOIN supplier ON l_suppkey = s_suppkey,
           |  (SELECT max(rev_dec) AS mr FROM rev) m
           |WHERE rev_dec = mr
           |ORDER BY s_suppkey""".stripMargin))

  /** ONE builder for the order-count-distribution (TPC-H Q13) shape,
    * shared by `star_cust_order_dist` and `star_q13_order_distribution`
    * — same plan, parameterized only by the excluded priority class
    * (the stand-in for the textbook comment-pattern filter). The LEFT
    * join keeps zero-order customers — the rows a semi-join loses —
    * with the exclusion on the JOIN side so an excluded order never
    * turns its customer into a zero-order row; count(o_orderkey), not
    * count(*), makes null-extended rows count 0. All-integer two-level
    * aggs; the distribution re-agg shuffles |distinct counts| rows.
    */
  private[queries] def custOrderDistQ(name: String, excluded: String): Q =
    Q(
      name,
      (s, d) => {
        val ord = t(s, d, "orders")
          .filter(col("o_orderpriority") =!= excluded)
          .select("o_orderkey", "o_custkey")
        t(s, d, "customer").select("c_custkey")
          .join(ord, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some(
        s"""SELECT c_count, count(*) AS custdist FROM (
           |  SELECT c_custkey, count(o_orderkey) AS c_count
           |  FROM customer LEFT JOIN orders
           |    ON c_custkey = o_custkey
           |    AND o_orderpriority <> '$excluded'
           |  GROUP BY c_custkey)
           |GROUP BY c_count
           |ORDER BY custdist DESC, c_count DESC""".stripMargin))

  val qs: Seq[Q] = Seq(
    // TPC-H Q1-flavor pricing summary: full lineitem scan, 2-key hash agg
    Q(
      "star_q1_pricing",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount"))
              .as("sum_disc_price"),
            // round(avg) is exempt from the ulp-immune-mean rule here:
            // l_quantity is integer-valued (1..50), so the double sum is
            // EXACT at any accumulation order (≪ 2^53) and the mean is
            // one correctly-rounded division of identical values
            round(avg(col("l_quantity")), 6).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some(
        s"""SELECT l_returnflag, l_linestatus,
           |  ${dsumSql("l_quantity")} AS sum_qty,
           |  ${dsumSql("l_extendedprice")} AS sum_base_price,
           |  ${dsumProdSql("l_extendedprice", "1.0 - l_discount")} AS sum_disc_price,
           |  round(avg(l_quantity), 6) AS avg_qty,
           |  count(*) AS count_order
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Q3-flavor: customer ⋈ orders ⋈ lineitem, revenue top-10.
    // customer is the small side → broadcast; orders⋈lineitem shuffles
    // once on orderkey.
    Q(
      "star_q3_top_orders",
      (s, d) => {
        val cust = t(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val ord = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_orderdate")
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_extendedprice", "l_discount")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy("o_orderkey")
          .agg(dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount"))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some(
        s"""SELECT o_orderkey,
           |  ${dsumProdSql("l_extendedprice", "1.0 - l_discount")} AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |WHERE c_mktsegment = 'BUILDING'
           |GROUP BY o_orderkey
           |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    // Q5-flavor: 6-table star join, all dimensions broadcast
    Q(
      "star_q5_region_revenue",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        val ord = t(s, d, "orders").select("o_orderkey", "o_custkey")
        val cust = t(s, d, "customer").select("c_custkey", "c_nationkey")
        val supp = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
        val nat = t(s, d, "nation")
          .select("n_nationkey", "n_name", "n_regionkey")
        val reg = t(s, d, "region").select("r_regionkey", "r_name")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount"))
            .as("revenue"))
          .orderBy("r_name", "n_name")
      },
      Some(
        s"""SELECT r_name, n_name,
           |  ${dsumProdSql("l_extendedprice", "1.0 - l_discount")} AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           |JOIN nation ON s_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name, n_name
           |ORDER BY r_name, n_name""".stripMargin)),

    // Left-semi join: EXISTS — orders having any high-quantity line
    Q(
      "star_semi_join",
      (s, d) => {
        val hi = t(s, d, "lineitem")
          .filter(col("l_quantity") >= 49).select("l_orderkey")
        t(s, d, "orders")
          .join(hi, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some(
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
          |ORDER BY o_orderkey""".stripMargin)),

    // Left-anti join: NOT EXISTS — customers with no orders
    Q(
      "star_anti_join",
      (s, d) =>
        t(s, d, "customer")
          .join(t(s, d, "orders"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey"),
      Some(
        """SELECT c_custkey, c_name FROM customer
          |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          |ORDER BY c_custkey""".stripMargin)),

    // Ranking window: top-3 orders per customer by price
    Q(
      "star_topn_per_customer",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders")
          .filter(col("o_custkey") <= 50)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rk")
      },
      Some(
        """WITH r AS (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |    row_number() OVER (PARTITION BY o_custkey
          |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
          |  FROM orders WHERE o_custkey <= 50)
          |SELECT o_custkey, rk, o_orderkey, o_totalprice
          |FROM r WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin)),

    // ROLLUP: hierarchical aggregate (grouping-set surface)
    Q(
      "star_rollup",
      (s, d) =>
        t(s, d, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(asc_nulls_first("l_returnflag"),
            asc_nulls_first("l_linestatus")),
      Some(
        s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
           |  ${dsumSql("l_quantity")} AS sum_qty
           |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
           |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // Predicate-variety scan: IN + LIKE + BETWEEN, all pushed to the
    // parquet reader (PushedFilters in .explain) — the filter surface a
    // 100 TB scan lives or dies by
    Q(
      "star_filter_pushdown",
      (s, d) =>
        t(s, d, "orders")
          .filter(col("o_orderstatus").isin("F", "O") &&
            col("o_orderpriority").like("1-%") &&
            col("o_totalprice").between(1000, 100000))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy("o_orderstatus"),
      Some(
        s"""SELECT o_orderstatus, count(*) AS n,
           |  ${dsumSql("o_totalprice")} AS sum_price
           |FROM orders
           |WHERE o_orderstatus IN ('F','O') AND o_orderpriority LIKE '1-%'
           |  AND o_totalprice BETWEEN 1000 AND 100000
           |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin)),

    // PIVOT: wide-format counts per linestatus (explicit value list so
    // the output schema is static)
    Q(
      "star_pivot",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(count(lit(1)))
          .select(col("l_returnflag"),
            coalesce(col("F"), lit(0L)).as("F"),
            coalesce(col("O"), lit(0L)).as("O"))
          .orderBy("l_returnflag"),
      Some(
        """SELECT l_returnflag,
          |  count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS F,
          |  count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS O
          |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // CUBE: full grouping-set lattice over two keys
    Q(
      "star_cube",
      (s, d) =>
        t(s, d, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"))
          .orderBy(asc_nulls_first("l_returnflag"),
            asc_nulls_first("l_linestatus")),
      Some(
        """SELECT l_returnflag, l_linestatus, count(*) AS n
          |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // Date bucketing on the fact table: orders per month
    Q(
      "star_orders_by_month",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
            .as("month"))
          .agg(count(lit(1)).as("n"),
            dsum(col("o_totalprice")).as("sum_price"))
          .orderBy("month"),
      Some(
        s"""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           |  count(*) AS n, ${dsumSql("o_totalprice")} AS sum_price
           |FROM orders GROUP BY 1 ORDER BY month""".stripMargin)),

    // Correlated scalar subqueries: orders priced above 1.5x their own
    // month's average. Catalyst DECORRELATES each subquery into a
    // month-level aggregate + join (RewriteCorrelatedScalarSubquery) —
    // the plan is two hash aggs over one scan plus a join on ~|months|
    // rows, never a per-row re-scan; at 100 TB the fact side shuffles
    // once on the month key and the 12-rows-per-year aggregate
    // broadcasts back. Month bucketing is date_trunc (native timestamp
    // arithmetic), not date_format — a per-row string formatter costs
    // more than the join it feeds. The 1.5x compare is cross-multiplied
    // (price·2·n > sum·3) in DECIMAL, so the boundary is exact on both
    // engines — avg() would return double and hinge on division
    // rounding. Every operand is explicitly width-typed so NEITHER
    // engine's result exceeds DECIMAL(38): an unconstrained
    // sum(DECIMAL(18,4)) is DECIMAL(38,4) in DuckDB and one more
    // multiply would silently fall back to DOUBLE — exactly the
    // divergence the cross-multiply exists to prevent. Documented
    // bounds: < 1e8 orders/month (DECIMAL(8,0)) and monthly sums
    // < 1e26 (DECIMAL(30,4)); exceeding them fails loudly (ANSI
    // overflow / DuckDB conversion error), never silently.
    Q(
      "star_above_avg_orders",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders_corr")
        s.sql(
          """SELECT o_orderkey,
            |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
            |  CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS price
            |FROM orders_corr o
            |WHERE CAST(o_totalprice AS DECIMAL(18,4)) * CAST(2 AS DECIMAL(1,0)) *
            |    (SELECT CAST(count(*) AS DECIMAL(8,0)) FROM orders_corr i
            |     WHERE date_trunc('month', i.o_orderdate)
            |         = date_trunc('month', o.o_orderdate))
            |  > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
            |            AS DECIMAL(30,4))
            |     FROM orders_corr i
            |     WHERE date_trunc('month', i.o_orderdate)
            |         = date_trunc('month', o.o_orderdate)) * CAST(3 AS DECIMAL(2,0))
            |ORDER BY o_orderkey""".stripMargin)
      },
      Some(
        """SELECT o_orderkey,
          |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
          |  CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS price
          |FROM orders o
          |WHERE CAST(o_totalprice AS DECIMAL(18,4)) * CAST(2 AS DECIMAL(1,0)) *
          |    (SELECT CAST(count(*) AS DECIMAL(8,0)) FROM orders i
          |     WHERE date_trunc('month', i.o_orderdate)
          |         = date_trunc('month', o.o_orderdate))
          |  > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
          |            AS DECIMAL(30,4))
          |     FROM orders i
          |     WHERE date_trunc('month', i.o_orderdate)
          |         = date_trunc('month', o.o_orderdate)) * CAST(3 AS DECIMAL(2,0))
          |ORDER BY o_orderkey""".stripMargin)),

    // The FAST PATH twin of star_above_avg_orders: identical rows, but
    // the per-month total and count are WINDOW aggregates over one
    // month partition instead of two correlated scalar subqueries.
    // Catalyst turns the correlated form into two separate month-grouped
    // aggregates of orders joined back — three scans of the fact table
    // and two shuffles; this form scans orders ONCE and shuffles ONCE
    // on the month key (PlanSpec pins the single-scan shape). At 100 TB
    // the difference is two full fact-table passes. Same exact-DECIMAL
    // cross-multiplied compare (price·2·n > sum·3), same documented
    // width bounds as the correlated twin.
    Q(
      "star_above_avg_orders_win",
      (s, d) => {
        val w = Window.partitionBy(date_trunc("month", col("o_orderdate")))
        t(s, d, "orders")
          .select(col("o_orderkey"),
            date_trunc("month", col("o_orderdate")).cast("date").as("month"),
            col("o_totalprice").cast(DecimalType(18, 4)).as("p"),
            sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w)
              .cast(DecimalType(30, 4)).as("msum"),
            count(lit(1)).over(w).cast(DecimalType(8, 0)).as("mn"))
          .filter(col("p") * lit(2).cast(DecimalType(1, 0)) * col("mn") >
            col("msum") * lit(3).cast(DecimalType(2, 0)))
          .select(col("o_orderkey"), col("month"),
            col("p").cast("double").as("price"))
          .orderBy("o_orderkey")
      },
      Some(
        """WITH w AS (
          |  SELECT o_orderkey,
          |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
          |    CAST(o_totalprice AS DECIMAL(18,4)) AS p,
          |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
          |      OVER (PARTITION BY date_trunc('month', o_orderdate))
          |      AS DECIMAL(30,4)) AS msum,
          |    CAST(count(*)
          |      OVER (PARTITION BY date_trunc('month', o_orderdate))
          |      AS DECIMAL(8,0)) AS mn
          |  FROM orders
          |)
          |SELECT o_orderkey, month, CAST(p AS DOUBLE) AS price
          |FROM w
          |WHERE p * CAST(2 AS DECIMAL(1,0)) * mn > msum * CAST(3 AS DECIMAL(2,0))
          |ORDER BY o_orderkey""".stripMargin)),

    // FULL OUTER join with asymmetric sides: nations' high-balance
    // customers vs low-balance suppliers. The acctbal filters make each
    // side miss nations the other has, so both null-extension
    // directions are actually exercised (a full outer where every key
    // matches is just an inner join with extra steps). Scale shape:
    // both inputs are pre-aggregated to <= |nations| rows BEFORE the
    // join — the full outer joins two tiny aggregates, never the base
    // tables; at 100 TB this is the one-scan-per-side + partial-agg
    // pattern, and the join itself is constant-size. one_sided
    // preserves the null-vs-zero distinction COALESCE erases.
    Q(
      "star_full_outer_nation",
      (s, d) => {
        val c = t(s, d, "customer").filter(col("c_acctbal") > 7000)
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_rich_cust"))
        val sp = t(s, d, "supplier").filter(col("s_acctbal") < 1000)
          .groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_poor_supp"))
        c.join(sp, Seq("nationkey"), "full_outer")
          .select(col("nationkey"),
            (col("n_rich_cust").isNull || col("n_poor_supp").isNull)
              .as("one_sided"),
            coalesce(col("n_rich_cust"), lit(0L)).as("n_rich_cust"),
            coalesce(col("n_poor_supp"), lit(0L)).as("n_poor_supp"))
          .orderBy("nationkey")
      },
      Some(
        """WITH c AS (
          |  SELECT c_nationkey AS nationkey, count(*) AS n_rich_cust
          |  FROM customer WHERE c_acctbal > 7000 GROUP BY 1
          |), sp AS (
          |  SELECT s_nationkey AS nationkey, count(*) AS n_poor_supp
          |  FROM supplier WHERE s_acctbal < 1000 GROUP BY 1
          |)
          |SELECT coalesce(c.nationkey, sp.nationkey) AS nationkey,
          |  (c.nationkey IS NULL OR sp.nationkey IS NULL) AS one_sided,
          |  coalesce(n_rich_cust, 0) AS n_rich_cust,
          |  coalesce(n_poor_supp, 0) AS n_poor_supp
          |FROM c FULL JOIN sp ON c.nationkey = sp.nationkey
          |ORDER BY nationkey""".stripMargin)),

    // UNPIVOT (melt) — the inverse of star_pivot: a wide per-nation
    // metrics row (customer count, supplier count, order count via
    // customer nation) melted into tidy (nationkey, metric, n) rows,
    // the shape chart/export layers want. Spark's native
    // Dataset.unpivot plans as an Expand (each input row emitted once
    // per value column) — a narrow, shuffle-free operator; all the
    // heavy lifting is the three partial-agg'd count shuffles BEFORE
    // the melt, each bounded by |nations| output rows. metric names
    // are the column names on both engines, so the melt itself is
    // oracle-checked, not just the counts.
    Q(
      "star_unpivot_nation",
      (s, d) => {
        val c = t(s, d, "customer")
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val sp = t(s, d, "supplier")
          .groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_supp"))
        val o = t(s, d, "orders")
          .join(t(s, d, "customer")
            .select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_orders"))
        c.join(sp, Seq("nationkey"), "full_outer")
          .join(o, Seq("nationkey"), "full_outer")
          .na.fill(0L, Seq("n_cust", "n_supp", "n_orders"))
          .unpivot(Array(col("nationkey")),
            Array(col("n_cust"), col("n_supp"), col("n_orders")),
            "metric", "n")
          .orderBy("nationkey", "metric")
      },
      Some(
        """WITH c AS (
          |  SELECT c_nationkey AS nationkey, count(*) AS n_cust
          |  FROM customer GROUP BY 1
          |), sp AS (
          |  SELECT s_nationkey AS nationkey, count(*) AS n_supp
          |  FROM supplier GROUP BY 1
          |), o AS (
          |  SELECT c_nationkey AS nationkey, count(*) AS n_orders
          |  FROM orders JOIN customer ON o_custkey = c_custkey
          |  GROUP BY 1
          |), wide AS (
          |  SELECT coalesce(c.nationkey, sp.nationkey, o.nationkey)
          |      AS nationkey,
          |    coalesce(n_cust, 0) AS n_cust,
          |    coalesce(n_supp, 0) AS n_supp,
          |    coalesce(n_orders, 0) AS n_orders
          |  FROM c FULL JOIN sp ON c.nationkey = sp.nationkey
          |       FULL JOIN o ON coalesce(c.nationkey, sp.nationkey)
          |         = o.nationkey
          |)
          |SELECT nationkey, metric, n
          |FROM wide UNPIVOT (n FOR metric IN (n_cust, n_supp, n_orders))
          |ORDER BY nationkey, metric""".stripMargin)),

    // GROUPING SETS — the general form cube/rollup specialize: exactly
    // the four strata a dashboard wants (by priority, by status, the
    // cross, and the grand total), no more. Spark plans ONE scan + an
    // Expand (each row emitted once per set) feeding a single partial-
    // agg'd hash agg — 4 sets here vs cube's 2^n; at 100 TB choosing
    // sets over cube is a 4x-vs-2^n Expand-width saving. grouping()
    // flags are emitted as INTs so the oracle can't confuse a NULL key
    // from data with a rolled-up NULL, and money is the exact
    // DECIMAL(18,4) sum.
    Q(
      "star_grouping_sets",
      (s, d) =>
        t(s, d, "orders")
          .groupingSets(
            Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")),
              Seq(col("o_orderpriority"), col("o_orderstatus")), Seq()),
            col("o_orderpriority"), col("o_orderstatus"))
          .agg(grouping(col("o_orderpriority")).cast("int").as("g_pri"),
            grouping(col("o_orderstatus")).cast("int").as("g_stat"),
            count(lit(1)).as("n"),
            dsum(col("o_totalprice")).as("total_price"))
          .orderBy(col("g_pri"), col("g_stat"),
            asc_nulls_first("o_orderpriority"),
            asc_nulls_first("o_orderstatus")),
      Some(
        s"""SELECT o_orderpriority, o_orderstatus,
           |  CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
           |  CAST(GROUPING(o_orderstatus) AS INT) AS g_stat,
           |  count(*) AS n,
           |  ${dsumSql("o_totalprice")} AS total_price
           |FROM orders
           |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
           |  (o_orderpriority, o_orderstatus), ())
           |ORDER BY g_pri, g_stat,
           |  o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)),

    // Window-over-aggregate: each nation's order revenue alongside its
    // region total, rank within region, and a dominance flag — the
    // share-of-total report shape. The corpus-sized work is ONE
    // orders⋈customer shuffle + partial-agg'd (nation) rollup; the
    // window (region total, rank) then runs over the |nations|-bounded
    // aggregate, so the sort the window needs is on 25 rows, not the
    // fact table. Exactness: revenue stays DECIMAL through the window
    // sum (order-independent), is compared cross-multiplied
    // (rev·5 ≥ region_rev ⟺ share ≥ 20%), and only the final outputs
    // cast to DOUBLE; rank ties break on n_name so the order is total.
    Q(
      "star_nation_share",
      (s, d) => {
        val nat = t(s, d, "nation")
          .select("n_nationkey", "n_name", "n_regionkey")
        val reg = t(s, d, "region").select("r_regionkey", "r_name")
        val byNation = t(s, d, "orders")
          .join(t(s, d, "customer").select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey"))
          .agg(sum(col("o_totalprice").cast(DecimalType(18, 4)))
            .as("rev_dec"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        val wReg = Window.partitionBy("r_name")
        val wRank = Window.partitionBy("r_name")
          .orderBy(col("rev_dec").desc, col("n_name"))
        byNation
          .withColumn("region_dec", sum(col("rev_dec")).over(wReg))
          .select(col("r_name"), col("n_name"),
            col("rev_dec").cast("double").as("revenue"),
            col("region_dec").cast("double").as("region_revenue"),
            row_number().over(wRank).as("rk"),
            (col("rev_dec") * 5 >= col("region_dec")).as("dominant"))
          .orderBy("r_name", "rk")
      },
      Some(
        """WITH by_nation AS (
          |  SELECT c_nationkey,
          |    sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev_dec
          |  FROM orders JOIN customer ON o_custkey = c_custkey
          |  GROUP BY c_nationkey
          |), named AS (
          |  SELECT r_name, n_name, rev_dec,
          |    sum(rev_dec) OVER (PARTITION BY r_name) AS region_dec
          |  FROM by_nation
          |  JOIN nation ON c_nationkey = n_nationkey
          |  JOIN region ON n_regionkey = r_regionkey
          |)
          |SELECT r_name, n_name,
          |  CAST(rev_dec AS DOUBLE) AS revenue,
          |  CAST(region_dec AS DOUBLE) AS region_revenue,
          |  CAST(row_number() OVER (PARTITION BY r_name
          |    ORDER BY rev_dec DESC, n_name) AS INT) AS rk,
          |  rev_dec * 5 >= region_dec AS dominant
          |FROM named
          |ORDER BY r_name, rk""".stripMargin)),

    // TPC-H Q18 flavor (large-volume orders): HAVING over a fact
    // aggregate, then join BACK to the other fact + dimension. The
    // aggregate-then-filter order matters at 100 TB: lineitem shuffles
    // once on l_orderkey with map-side partials, HAVING cuts the
    // qualifying set to ~0.1% of orders, and only that bounded survivor
    // set joins orders/customer — with AQE free to broadcast it at
    // runtime because the filtered agg is tiny. (The anti-pattern —
    // join first, filter later — would shuffle the full fact-fact
    // product.) Quantities are <=2-decimal doubles: decimal-summed,
    // exact; top-100 by (sum_qty DESC, orderkey) is collision-free.
    Q(
      "star_big_orders",
      (s, d) => {
        val big = t(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(dsum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 250)
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(t(s, d, "customer").select("c_custkey", "c_name"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("o_orderkey"), col("o_totalprice"),
            col("sum_qty"))
          .orderBy(col("sum_qty").desc, col("o_orderkey"))
          .limit(100)
      },
      Some(
        s"""WITH big AS (
           |  SELECT l_orderkey, ${dsumSql("l_quantity")} AS sum_qty
           |  FROM lineitem GROUP BY l_orderkey
           |  HAVING sum_qty > 250
           |)
           |SELECT c_name, o_orderkey, o_totalprice, sum_qty
           |FROM orders
           |JOIN big ON o_orderkey = l_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |ORDER BY sum_qty DESC, o_orderkey LIMIT 100""".stripMargin)),

    // TPC-H Q13 flavor — see custOrderDistQ; the '1-URGENT' exclusion
    // is this variant's stand-in for the comment-pattern filter
    custOrderDistQ("star_cust_order_dist", "1-URGENT"),

    // TPC-H Q15 flavor (1996 quarter) — see topSupplierQ
    topSupplierQ("star_top_supplier", "1996-01-01", "1996-04-01"),

    // TPC-H Q22 flavor (global sales opportunity): customers with
    // above-average positive balance and NO orders — per nation, count
    // and exact-decimal balance mass. Composes the two "hard" planner
    // moves in one query: an uncorrelated scalar subquery (the global
    // positive-balance average, broadcast as a 1-row frame and compared
    // in DECIMAL via cross-multiplication — avg() itself would divide)
    // and a LEFT ANTI join against the orders fact. Scale shape: the
    // scalar agg is one partial-agg'd scan; the anti join shuffles
    // customer vs the pre-projected single-column orders key set
    // (partial-distinct'd by AQE), then the nation rollup is bounded.
    Q(
      "star_idle_rich_customers",
      (s, d) => {
        val D = DecimalType(18, 4)
        val cust = t(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"),
            col("c_acctbal").cast(D).as("bal"))
        val stat = cust.filter(col("bal") > 0)
          .agg(sum(col("bal")).as("bal_sum"),
            count(lit(1)).as("bal_n"))
        val orderKeys = t(s, d, "orders").select("o_custkey")
        cust.crossJoin(broadcast(stat))
          // bal > avg(positive bals) as the cross-multiplied decimal
          // compare bal * n > sum — exact, no division anywhere
          .filter(col("bal") * col("bal_n") > col("bal_sum"))
          .join(orderKeys, col("c_custkey") === col("o_custkey"),
            "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("numcust"),
            sum(col("bal")).cast("double").as("totacctbal"))
          .orderBy("c_nationkey")
      },
      Some(
        """WITH cust AS (
          |  SELECT c_custkey, c_nationkey,
          |    CAST(c_acctbal AS DECIMAL(18,4)) AS bal
          |  FROM customer
          |), stat AS (
          |  SELECT CAST(sum(bal) AS DECIMAL(38,4)) AS bal_sum,
          |    CAST(count(*) AS BIGINT) AS bal_n
          |  FROM cust WHERE bal > 0
          |)
          |SELECT c_nationkey, count(*) AS numcust,
          |  CAST(sum(bal) AS DOUBLE) AS totacctbal
          |FROM cust CROSS JOIN stat
          |WHERE bal * bal_n > bal_sum
          |  AND NOT EXISTS (SELECT 1 FROM orders
          |                  WHERE o_custkey = c_custkey)
          |GROUP BY c_nationkey
          |ORDER BY c_nationkey""".stripMargin))
  )
}
