package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.{Q, Tables}
import graft.functions.Num._

/** Completion of the classic TPC-H query shapes over the star schema
  * (the queries StarQueries.scala had not yet covered), each ADAPTED to
  * the columns the testdata actually has (no partsupp, no
  * commitdate/receiptdate/shipmode — lateness is re-expressed as
  * `l_shipdate > o_orderdate + N days`, supplier-part facts come from
  * lineitem itself).
  *
  * Shared scale discipline (same as StarQueries):
  *  - region/nation/supplier/part are broadcast — the fact side never
  *    shuffles for a dimension lookup;
  *  - orders ⋈ lineitem is the one genuine fact-fact shuffle, always on
  *    the join key with partial aggregation on top;
  *  - every money aggregate is an exact DECIMAL(18,4) sum
  *    ([[graft.functions.Num]]) so results are order-independent under
  *    AQE at any scale, and every ratio is emitted as exact numerator +
  *    denominator plus ONE double division (a single IEEE op both
  *    engines perform identically — unlike a double SUM, a double DIV
  *    has no order dependence).
  *
  * The headline Spark-first rewrite here is Q21: the reference shape is
  * a self-join + EXISTS + NOT-EXISTS (three passes over lineitem); the
  * Spark plan aggregates lineitem ONCE per order (distinct-supplier and
  * distinct-late-supplier counts) and filters the aggregate — the
  * DuckDB oracle keeps the textbook correlated form, so the correctness
  * gate doubles as an equivalence proof of the rewrite.
  */
object TpchQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.t(s, d, n)

  private val D = DecimalType(18, 4)

  val qs: Seq[Q] = Seq(
    // ----- Q4 flavor: order-priority count with an EXISTS-late line.
    // Lateness adapted to shipdate - orderdate > 90 days (no
    // commit/receipt dates in this schema). The date filter prunes the
    // orders scan (pushed to parquet); the semi join shuffles both
    // sides on orderkey once and keeps at most one row per order —
    // no row explosion at any scale.
    Q(
      "star_q4_priority",
      (s, d) => {
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
          .select("o_orderkey", "o_orderpriority", "o_orderdate")
        val li = t(s, d, "lineitem").select("l_orderkey", "l_shipdate")
        ord
          .join(li,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some(
        """SELECT o_orderpriority, count(*) AS order_count
          |FROM orders o
          |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          |  AND o_orderdate < TIMESTAMP '1997-04-01'
          |  AND EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_orderkey = o_orderkey
          |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)),

    // ----- Q6 flavor: forecast-revenue — the purest pushdown query in
    // the suite: single scan, all three predicates land in
    // PushedFilters, two-column ReadSchema, one partial+final agg.
    // The discount BETWEEN bounds compare the stored doubles against
    // double literals both engines parse identically — deterministic.
    Q(
      "star_q6_forecast_revenue",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
          .agg(
            dsumProd(col("l_extendedprice"), col("l_discount"))
              .as("revenue"),
            count(lit(1)).as("n_lines")),
      Some(
        s"""SELECT
           |  ${dsumProdSql("l_extendedprice", "l_discount")} AS revenue,
           |  count(*) AS n_lines
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           |  AND l_shipdate < TIMESTAMP '1998-01-01'
           |  AND l_discount BETWEEN 0.05 AND 0.07
           |  AND l_quantity < 24""".stripMargin)),

    // ----- Q7 flavor: volume shipping between two nations. Supplier
    // and customer are pre-filtered to the two nations BEFORE the
    // broadcast (dimension pruning), so the fact rows that survive the
    // two broadcast joins are exactly the cross-nation trade rows; the
    // direction filter then keeps the two asymmetric pairs.
    Q(
      "star_q7_volume_shipping",
      (s, d) => {
        val nat2 = t(s, d, "nation")
          .filter(col("n_name").isin("NATION_1", "NATION_2"))
        val supp = t(s, d, "supplier")
          .join(nat2.select(col("n_nationkey"), col("n_name").as("supp_nation")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "supp_nation")
        val cust = t(s, d, "customer")
          .join(nat2.select(col("n_nationkey").as("nk2"),
            col("n_name").as("cust_nation")),
            col("c_nationkey") === col("nk2"))
          .select("c_custkey", "cust_nation")
        val ord = t(s, d, "orders").select("o_orderkey", "o_custkey")
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select("l_orderkey", "l_suppkey", "l_shipdate",
            "l_extendedprice", "l_discount")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .filter(
            (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount"))
            .as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(
        s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           |  year(l_shipdate) AS l_year,
           |  ${dsumProdSql("l_extendedprice", "1.0 - l_discount")} AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation sn ON s_nationkey = sn.n_nationkey
           |JOIN nation cn ON c_nationkey = cn.n_nationkey
           |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           |  AND l_shipdate < TIMESTAMP '1998-01-01'
           |  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           |    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
           |GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
           |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // ----- Q8 flavor: national market share inside one customer
    // region. Numerator and denominator are both exact decimal sums;
    // the share is the single double division of their casts, so the
    // oracle reproduces it bit-for-bit.
    Q(
      "star_q8_market_share",
      (s, d) => {
        val asiaNat = t(s, d, "nation")
          .join(broadcast(t(s, d, "region")
            .filter(col("r_name") === "ASIA").select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))
        val cust = t(s, d, "customer")
          .join(broadcast(asiaNat), col("c_nationkey") === col("n_nationkey"))
          .select("c_custkey")
        val supp = t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")
            .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("snk"))
          .select("s_suppkey", "supp_nation")
        val econParts = t(s, d, "part")
          .filter(col("p_type") === "ECONOMY").select("p_partkey")
        val ord = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_orderdate")
        val volume = col("l_extendedprice").cast(D) *
          (lit(1.0) - col("l_discount")).cast(D)
        t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount")
          .join(broadcast(econParts), col("l_partkey") === col("p_partkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"),
            "left_semi")
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_3", volume)
              .otherwise(lit(0))).cast("double").as("mkt_volume"),
            sum(volume).cast("double").as("total_volume"))
          .withColumn("mkt_share", col("mkt_volume") / col("total_volume"))
          .orderBy("o_year")
      },
      Some(
        """WITH vol AS (
          |  SELECT year(o_orderdate) AS o_year,
          |    CAST(l_extendedprice AS DECIMAL(18,4)) *
          |      CAST(1.0 - l_discount AS DECIMAL(18,4)) AS v,
          |    sn.n_name AS supp_nation
          |  FROM lineitem
          |  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
          |  JOIN orders ON l_orderkey = o_orderkey
          |  JOIN supplier ON l_suppkey = s_suppkey
          |  JOIN nation sn ON s_nationkey = sn.n_nationkey
          |  WHERE o_custkey IN (
          |    SELECT c_custkey FROM customer
          |    JOIN nation cn ON c_nationkey = cn.n_nationkey
          |    JOIN region ON cn.n_regionkey = r_regionkey
          |    WHERE r_name = 'ASIA')
          |)
          |SELECT o_year,
          |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE 0 END)
          |       AS DOUBLE) AS mkt_volume,
          |  CAST(sum(v) AS DOUBLE) AS total_volume,
          |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE 0 END)
          |       AS DOUBLE) / CAST(sum(v) AS DOUBLE) AS mkt_share
          |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin)),

    // ----- Q9 flavor: product-type profit by supplier nation and year.
    // No partsupp/supplycost in this schema: cost is proxied as 10% of
    // p_retailprice × quantity. To keep every intermediate inside
    // DECIMAL(38) (three chained 18,4 multiplies would overflow and
    // round), the revenue term is scaled ×10 INSIDE the double factor
    // ((1-disc)*10 has 3 decimal digits → exact in DECIMAL(18,4)), the
    // cost term uses qty×retail directly, and the final sum is divided
    // back by 10 in ONE double op.
    Q(
      "star_q9_profit_proxy",
      (s, d) => {
        val redParts = t(s, d, "part")
          .filter(col("p_name").like("%red%"))
          .select("p_partkey", "p_retailprice")
        val supp = t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")
            .select(col("n_nationkey"), col("n_name").as("nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "nation")
        val amount10 =
          col("l_extendedprice").cast(D) *
            ((lit(1.0) - col("l_discount")) * lit(10)).cast(D) -
            col("l_quantity").cast(D) * col("p_retailprice").cast(D)
        t(s, d, "lineitem")
          .select("l_partkey", "l_suppkey", "l_shipdate",
            "l_extendedprice", "l_discount", "l_quantity")
          .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("nation"), year(col("l_shipdate")).as("l_year"))
          .agg((sum(amount10).cast("double") / lit(10)).as("profit"))
          .orderBy("nation", "l_year")
      },
      Some(
        """SELECT n_name AS nation, year(l_shipdate) AS l_year,
          |  CAST(sum(
          |    CAST(l_extendedprice AS DECIMAL(18,4)) *
          |      CAST((1.0 - l_discount) * 10 AS DECIMAL(18,4)) -
          |    CAST(l_quantity AS DECIMAL(18,4)) *
          |      CAST(p_retailprice AS DECIMAL(18,4))
          |  ) AS DOUBLE) / 10 AS profit
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |GROUP BY n_name, year(l_shipdate)
          |ORDER BY nation, l_year""".stripMargin)),

    // ----- Q10 flavor: top returned-revenue customers in a quarter.
    // Scale shape: aggregate lineitem⋈orders down to one row per
    // custkey FIRST, then join the bounded aggregate to customer ⋈
    // nation — customer enrichment never touches fact-cardinality rows.
    Q(
      "star_q10_returned_revenue",
      (s, d) => {
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey")
        val byCust = t(s, d, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_custkey")
          .agg(dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount"))
            .as("revenue"))
        val cust = t(s, d, "customer")
          .join(broadcast(t(s, d, "nation")
            .select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .select("c_custkey", "c_name", "n_name")
        byCust.join(cust, col("o_custkey") === col("c_custkey"))
          .select("c_custkey", "c_name", "n_name", "revenue")
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(
        s"""SELECT c_custkey, c_name, n_name,
           |  ${dsumProdSql("l_extendedprice", "1.0 - l_discount")} AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |WHERE l_returnflag = 'R'
           |  AND o_orderdate >= TIMESTAMP '1997-01-01'
           |  AND o_orderdate < TIMESTAMP '1997-04-01'
           |GROUP BY c_custkey, c_name, n_name
           |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // ----- Q14 flavor: promo revenue share in one month — conditional
    // decimal aggregation over the part broadcast join, share emitted
    // as exact num/den plus one double division.
    Q(
      "star_q14_promo_share",
      (s, d) => {
        val volume = col("l_extendedprice").cast(D) *
          (lit(1.0) - col("l_discount")).cast(D)
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
          .select("l_partkey", "l_extendedprice", "l_discount")
          .join(broadcast(t(s, d, "part").select("p_partkey", "p_type")),
            col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", volume).otherwise(lit(0)))
              .cast("double").as("promo_volume"),
            sum(volume).cast("double").as("total_volume"))
          .withColumn("promo_pct",
            lit(100.0) * col("promo_volume") / col("total_volume"))
      },
      Some(
        """SELECT
          |  CAST(sum(CASE WHEN p_type = 'PROMO'
          |    THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
          |         CAST(1.0 - l_discount AS DECIMAL(18,4))
          |    ELSE 0 END) AS DOUBLE) AS promo_volume,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
          |           CAST(1.0 - l_discount AS DECIMAL(18,4)))
          |       AS DOUBLE) AS total_volume,
          |  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
          |    THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
          |         CAST(1.0 - l_discount AS DECIMAL(18,4))
          |    ELSE 0 END) AS DOUBLE)
          |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
          |             CAST(1.0 - l_discount AS DECIMAL(18,4)))
          |         AS DOUBLE) AS promo_pct
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |WHERE l_shipdate >= TIMESTAMP '1997-06-01'
          |  AND l_shipdate < TIMESTAMP '1997-07-01'""".stripMargin)),

    // ----- Q16 flavor: supplier variety per part segment. partsupp
    // does not exist here, so the supplier-part relation is mined from
    // lineitem (who actually shipped the part). count(DISTINCT
    // l_suppkey) per (brand, type, size) — the distinct runs inside the
    // grouped agg (two-phase: partial distinct-collapse per partition,
    // then final), never as a whole-table distinct.
    Q(
      "star_q16_supplier_variety",
      (s, d) => {
        val parts = t(s, d, "part")
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49))
          .select("p_partkey", "p_brand", "p_type", "p_size")
        t(s, d, "lineitem").select("l_partkey", "l_suppkey")
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some(
        """SELECT p_brand, p_type, p_size,
          |  count(DISTINCT l_suppkey) AS supplier_cnt
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
          |GROUP BY p_brand, p_type, p_size
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // ----- Q17 flavor: small-quantity revenue for one brand. The
    // correlated per-part average is a WINDOW over the partkey
    // partition (one shuffle, no self-join), and the avg comparison is
    // cross-multiplied into exact decimals: qty < 0.2·avg ⟺
    // qty·5·n < Σqty. Only lineitems of the brand's parts are ever
    // shuffled (broadcast key filter first).
    Q(
      "star_q17_small_qty_revenue",
      (s, d) => {
        val brandKeys = t(s, d, "part")
          .filter(col("p_brand") === "Brand#5").select("p_partkey")
        val li = t(s, d, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice")
          .join(broadcast(brandKeys), col("l_partkey") === col("p_partkey"),
            "left_semi")
        val w = Window.partitionBy("l_partkey")
        li.withColumn("n_part", count(lit(1)).over(w))
          .withColumn("sq_part", sum(col("l_quantity").cast(D)).over(w))
          .filter(col("l_quantity").cast(D) * lit(5) * col("n_part") <
            col("sq_part"))
          .agg(
            count(lit(1)).as("n_small"),
            (dsum(col("l_extendedprice")) / lit(7)).as("avg_yearly"))
      },
      Some(
        """WITH li AS (
          |  SELECT l_partkey, l_quantity, l_extendedprice,
          |    count(*) OVER (PARTITION BY l_partkey) AS n_part,
          |    sum(CAST(l_quantity AS DECIMAL(18,4)))
          |      OVER (PARTITION BY l_partkey) AS sq_part
          |  FROM lineitem
          |  WHERE l_partkey IN
          |    (SELECT p_partkey FROM part WHERE p_brand = 'Brand#5')
          |)
          |SELECT count(*) AS n_small,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7
          |    AS avg_yearly
          |FROM li
          |WHERE CAST(l_quantity AS DECIMAL(18,4)) * 5 * n_part < sq_part
          |""".stripMargin)),

    // ----- Q19 flavor: disjunctive bracketed revenue. The three
    // (brand, size-range, qty-range) conjuncts OR together across BOTH
    // join sides; Catalyst cannot push the disjunction into either scan
    // whole, but it pushes the derived common bounds and keeps the
    // residual on the broadcast-joined rows — the classic OR-of-ANDs
    // stress for a planner.
    Q(
      "star_q19_bracket_revenue",
      (s, d) => {
        val parts = t(s, d, "part").select("p_partkey", "p_brand", "p_size")
        t(s, d, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
              (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
                col("l_quantity").between(10, 20)) ||
              (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
                col("l_quantity").between(20, 30)))
          .agg(
            dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount"))
              .as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some(
        s"""SELECT
           |  ${dsumProdSql("l_extendedprice", "1.0 - l_discount")} AS revenue,
           |  count(*) AS n_lines
           |FROM lineitem
           |JOIN part ON l_partkey = p_partkey
           |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           |       AND l_quantity BETWEEN 1 AND 11)
           |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           |       AND l_quantity BETWEEN 10 AND 20)
           |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // ----- Q20 flavor: suppliers who moved serious promo volume in a
    // year (availqty does not exist; the HAVING threshold stands in
    // for the half-of-stock test). Aggregate-then-broadcast: the
    // having-filtered per-supplier aggregate is at most |supplier|
    // rows, joined broadcast to the dimension for names.
    Q(
      "star_q20_promo_suppliers",
      (s, d) => {
        val promoKeys = t(s, d, "part")
          .filter(col("p_type") === "PROMO").select("p_partkey")
        val bySupp = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select("l_partkey", "l_suppkey", "l_quantity")
          .join(broadcast(promoKeys), col("l_partkey") === col("p_partkey"),
            "left_semi")
          .groupBy("l_suppkey")
          .agg(sum(col("l_quantity").cast(D)).as("promo_qty_dec"))
          .filter(col("promo_qty_dec") > 300)
        bySupp
          .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("promo_qty_dec").cast("double").as("promo_qty"))
          .orderBy("s_suppkey")
      },
      Some(
        """SELECT s_suppkey, s_name,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
          |    AS promo_qty
          |FROM lineitem
          |JOIN supplier ON l_suppkey = s_suppkey
          |WHERE l_partkey IN (SELECT p_partkey FROM part
          |                    WHERE p_type = 'PROMO')
          |  AND l_shipdate >= TIMESTAMP '1997-01-01'
          |  AND l_shipdate < TIMESTAMP '1998-01-01'
          |GROUP BY s_suppkey, s_name
          |HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 300
          |ORDER BY s_suppkey""".stripMargin)),

    // ----- Q21 flavor: the sole-late supplier on multi-supplier
    // finished orders. Reference shape: lineitem self-joined twice
    // (EXISTS another supplier, NOT EXISTS another LATE supplier).
    // Spark-first rewrite, two-level: (1) collapse lineitem to one row
    // per (order, supplier) carrying max(l_shipdate) — a supplier is
    // late on an order iff its LATEST line is late, so the per-pair max
    // preserves lateness exactly; (2) join the finished orders and
    // aggregate per order with PLAIN count/max — the pair level already
    // made suppliers distinct, so no countDistinct survives. The first
    // cut used two countDistincts over the joined fact rows; at the
    // 30x star probe that planned an Expand x3 (54M expanded rows) +
    // an extra wide exchange and went 6x super-linear (2.9 s -> 18.6 s).
    // This form repartitions the fact ONCE by l_orderkey; the pair agg
    // (ClusteredDistribution satisfied by the orderkey partitioning),
    // the orders join, and the per-order agg all reuse that one
    // exchange — no Expand anywhere (PlanSpec-pinned). The oracle keeps
    // the textbook correlated form, so the hash gate proves the rewrite
    // equivalent. Lateness adapted to shipdate > orderdate + 90 days.
    Q(
      "star_q21_sole_late_supplier",
      (s, d) => {
        val ord = t(s, d, "orders")
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate")
        val perPair = t(s, d, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate")
          // countDistinct ignored null suppkeys; the pair form must too
          .filter(col("l_suppkey").isNotNull)
          .repartition(col("l_orderkey"))
          .groupBy("l_orderkey", "l_suppkey")
          .agg(max(col("l_shipdate")).as("max_ship"))
        val late = col("max_ship") >
          col("o_orderdate") + expr("INTERVAL 90 DAYS")
        val perOrder = perPair
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderkey")
          .agg(
            count(lit(1)).as("ns"),
            count(when(late, 1)).as("nl"),
            max(when(late, col("l_suppkey"))).as("sole_suppkey"))
          .filter(col("ns") >= 2 && col("nl") === 1)
        perOrder
          .groupBy("sole_suppkey")
          .agg(count(lit(1)).as("numwait"))
          .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
            col("sole_suppkey") === col("s_suppkey"))
          .select("s_name", "numwait")
          .orderBy(col("numwait").desc, col("s_name"))
      },
      Some(
        """SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
          |FROM lineitem l1
          |JOIN orders o ON o.o_orderkey = l1.l_orderkey
          |JOIN supplier ON s_suppkey = l1.l_suppkey
          |WHERE o.o_orderstatus = 'F'
          |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          |  AND EXISTS (SELECT 1 FROM lineitem l2
          |              WHERE l2.l_orderkey = l1.l_orderkey
          |                AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
          |                  WHERE l3.l_orderkey = l1.l_orderkey
          |                    AND l3.l_suppkey <> l1.l_suppkey
          |                    AND l3.l_shipdate >
          |                        o.o_orderdate + INTERVAL 90 DAY)
          |GROUP BY s_name
          |ORDER BY numwait DESC, s_name""".stripMargin)),

    // ----- Q12 flavor: late-shipment counts by line status x order
    // priority band (l_linestatus stands in for the absent shipmode;
    // lateness is the header's l_shipdate > o_orderdate + N days form).
    // One fact-fact shuffle on the order key, conditional partial-agg'd
    // counts on top — |statuses| output rows.
    Q(
      "star_q12_late_priority",
      (s, d) => {
        val ord = t(s, d, "orders")
          .select("o_orderkey", "o_orderdate", "o_orderpriority")
        val li = t(s, d, "lineitem")
          .select("l_orderkey", "l_linestatus", "l_shipdate")
        val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .groupBy("l_linestatus")
          .agg(
            sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy("l_linestatus")
      },
      Some(
        """SELECT l_linestatus,
          |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          |        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
          |        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
          |GROUP BY l_linestatus
          |ORDER BY l_linestatus""".stripMargin)),

    // ----- Q18 flavor: large-volume customers. Spark-first rewrite:
    // the textbook form re-aggregates lineitem inside an IN subquery
    // AND in the outer query; here the per-order quantity aggregate is
    // computed ONCE and both filters (the HAVING) and the output column
    // read it. Joins stay on the natural keys (orderkey, custkey) —
    // co-located/bucketable fact-fact shuffles; the HAVING filter cuts
    // the order side to ~1-2% before either join, and AQE broadcasts
    // the survivors at small scale. The oracle keeps the textbook
    // IN-subquery form, so the gate doubles as an equivalence proof.
    Q(
      "star_q18_large_orders",
      (s, d) => {
        val qty = t(s, d, "lineitem")
          .select("l_orderkey", "l_quantity")
          .groupBy("l_orderkey")
          .agg(dsum(col("l_quantity")).as("total_qty"))
          .filter(col("total_qty") > 250.0)
        val ord = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        val cust = t(s, d, "customer").select("c_custkey", "c_name")
        ord.join(qty, col("o_orderkey") === col("l_orderkey"))
          .join(cust, col("c_custkey") === col("o_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            // via TIMESTAMP: o_orderdate reads as TIMESTAMP_NTZ in this
            // testdata shape (no direct NTZ->BIGINT cast); the NTZ->TZ
            // hop is value-preserving under the pinned UTC session and
            // a no-op if a regeneration ships plain UTC micros
            col("o_orderdate").cast("timestamp").cast("long")
              .as("o_date_s"),
            col("o_totalprice"), col("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some(
        s"""SELECT c_name, c_custkey, o_orderkey,
           |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_date_s,
           |  o_totalprice, total_qty
           |FROM orders
           |JOIN (SELECT l_orderkey, ${dsumSql("l_quantity")} AS total_qty
           |      FROM lineitem GROUP BY l_orderkey
           |      HAVING ${dsumSql("l_quantity")} > 250.0) q
           |  ON o_orderkey = q.l_orderkey
           |JOIN customer ON c_custkey = o_custkey
           |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // ----- Q2 flavor: minimum-cost supplier per part within a region.
    // The schema has no partsupp, so the supplier-part cost fact is
    // DERIVED from lineitem: cost(part, supp) = min observed unit price
    // (l_extendedprice / l_quantity — one IEEE division both engines
    // perform identically; min over identical doubles is exact).
    // Spark-first shape vs the textbook correlated-subquery form the
    // oracle keeps: (1) part filter becomes a broadcast semi-join BEFORE
    // the per-part min — valid because min-cost within a part's group
    // is independent of other parts — so everything downstream runs on
    // the filtered slice only; (2) the correlated "= (SELECT min...)"
    // becomes a per-part window min over the (part,supp) aggregate —
    // one l_partkey exchange, no second aggregate, no min-match
    // self-join (the first cut planned an extra (partkey,cost) shuffle
    // + SortMergeJoin; the Q17 window precedent removes both);
    // (3) supplier⋈nation⋈region is a broadcast chain — the fact side
    // never shuffles for the region predicate.
    Q(
      "star_q2_min_cost_supplier",
      (s, d) => {
        val euroSupp = t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")
            .select("n_nationkey", "n_name", "n_regionkey")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")
            .filter(col("r_name") === "EUROPE").select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        val wantedParts = t(s, d, "part")
          .filter(col("p_type") === "STANDARD" && col("p_size") <= 15)
          .select("p_partkey", "p_name")
        val ps = t(s, d, "lineitem")
          .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
          .join(broadcast(wantedParts.select("p_partkey")),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy("l_partkey", "l_suppkey")
          .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
          .join(broadcast(euroSupp), col("l_suppkey") === col("s_suppkey"))
        ps.withColumn("min_cost",
            min(col("cost")).over(Window.partitionBy(col("l_partkey"))))
          .filter(col("cost") === col("min_cost"))
          .join(broadcast(wantedParts), col("l_partkey") === col("p_partkey"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_name"), col("cost"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
      },
      Some(
        """WITH ps AS (
          |  SELECT l_partkey, l_suppkey,
          |    min(l_extendedprice / l_quantity) AS cost
          |  FROM lineitem GROUP BY 1, 2),
          |eps AS (
          |  SELECT ps.*, s_acctbal, s_name, n_name
          |  FROM ps JOIN supplier ON l_suppkey = s_suppkey
          |  JOIN nation ON s_nationkey = n_nationkey
          |  JOIN region ON n_regionkey = r_regionkey
          |  WHERE r_name = 'EUROPE')
          |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
          |FROM eps JOIN part ON p_partkey = l_partkey
          |WHERE p_type = 'STANDARD' AND p_size <= 15
          |  AND cost = (SELECT min(cost) FROM eps e2
          |              WHERE e2.l_partkey = eps.l_partkey)
          |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin)),

    // ----- Q11 flavor: important stock value per part. No partsupp /
    // availqty, so "stock value" is re-expressed as delivered revenue
    // sum(extendedprice * (1 - discount)) restricted to suppliers of one
    // region, and the HAVING fraction (value > 0.1% of total) is decided
    // by exact decimal cross-multiplication (value * 1000 > total) —
    // no ratio is ever materialized, so the gate is order-independent
    // at any scale. Shape: broadcast semi-join of the fact on the ~20
    // region suppliers, ONE groupBy(partkey) decimal agg, then a 1-row
    // broadcast of the grand total against the per-part rows.
    Q(
      "star_q11_important_stock",
      (s, d) => {
        val euroSuppKeys = t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation").select("n_nationkey",
            "n_regionkey")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")
            .filter(col("r_name") === "EUROPE").select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey")
        val v = t(s, d, "lineitem")
          .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
          .join(broadcast(euroSuppKeys),
            col("l_suppkey") === col("s_suppkey"), "left_semi")
          .groupBy("l_partkey")
          .agg(sum(col("l_extendedprice").cast(D) *
            (lit(1.0) - col("l_discount")).cast(D)).as("val_dec"))
        v.crossJoin(broadcast(v.agg(sum(col("val_dec")).as("total_dec"))))
          .filter(col("val_dec") * 1000 > col("total_dec"))
          .select(col("l_partkey").as("p_partkey"),
            col("val_dec").cast("double").as("value"))
          .orderBy(col("value").desc, col("p_partkey"))
      },
      Some(
        """WITH v AS (
          |  SELECT l_partkey,
          |    sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
          |        CAST(1.0 - l_discount AS DECIMAL(18,4))) AS val_dec
          |  FROM lineitem
          |  WHERE l_suppkey IN (
          |    SELECT s_suppkey FROM supplier
          |    JOIN nation ON s_nationkey = n_nationkey
          |    JOIN region ON n_regionkey = r_regionkey
          |    WHERE r_name = 'EUROPE')
          |  GROUP BY 1)
          |SELECT l_partkey AS p_partkey, CAST(val_dec AS DOUBLE) AS value
          |FROM v, (SELECT sum(val_dec) AS total_dec FROM v) t
          |WHERE val_dec * 1000 > total_dec
          |ORDER BY value DESC, p_partkey""".stripMargin)),

    // ----- Q13 flavor: customer order-count distribution — the SAME
    // builder as star_cust_order_dist (StarQueries.custOrderDistQ),
    // parameterized by this variant's excluded priority class.
    StarQueries.custOrderDistQ(
      "star_q13_order_distribution", "4-NOT SPECIFIED"),

    // ----- Q15 flavor (1997 quarter) — the SAME builder as
    // star_top_supplier (StarQueries.topSupplierQ), which carries the
    // ReuseExchange one-scan pin for BOTH variants.
    StarQueries.topSupplierQ(
      "star_q15_top_supplier", "1997-01-01", "1997-04-01"),

    // ----- Q22 flavor: dormant high-balance customers. Sibling of
    // star_idle_rich_customers (same cross-multiplied above-average +
    // LeftAnti core), kept separate because the variants exercise
    // DIFFERENT planner paths: idle_rich anti-joins the full orders key
    // set and aggregates globally; this one date-prunes the anti side,
    // restricts the pool to a nationkey set, and rolls up per nation.
    // The textbook
    // phone-prefix country codes become a nationkey set (no phone
    // column), and "never ordered" becomes "no order since 1999"
    // (this testdata gives every customer at least one order, which
    // would make the textbook anti-join vacuously empty). The
    // above-average-balance test is exact decimal cross-multiplication
    // (bal * n > sum) against a 1-row broadcast of the positive-balance
    // pool stats — no average is materialized. The anti join keys on
    // custkey against the date-pruned orders slice; at scale both sides
    // shuffle on the key once (or AQE broadcasts the pruned side).
    Q(
      "star_q22_dormant_customers",
      (s, d) => {
        val pool = t(s, d, "customer")
          .filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
          .select(col("c_custkey"), col("c_nationkey"),
            col("c_acctbal").cast(D).as("bal"))
        val stats = pool.filter(col("bal") > 0)
          .agg(count(lit(1)).as("cnt"), sum(col("bal")).as("s"))
        val recent = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select("o_custkey")
        pool.crossJoin(broadcast(stats))
          .filter(col("bal") * col("cnt") > col("s"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("numcust"),
            sum(col("bal")).cast("double").as("totacctbal"))
          .orderBy("c_nationkey")
      },
      Some(
        """WITH pool AS (
          |  SELECT c_custkey, c_nationkey,
          |    CAST(c_acctbal AS DECIMAL(18,4)) AS bal
          |  FROM customer
          |  WHERE c_nationkey IN (1,3,5,7,9,11,13)),
          |a AS (SELECT count(*) AS cnt, sum(bal) AS s
          |      FROM pool WHERE bal > 0)
          |SELECT c_nationkey, count(*) AS numcust,
          |  CAST(sum(bal) AS DOUBLE) AS totacctbal
          |FROM pool, a
          |WHERE bal * cnt > s
          |  AND NOT EXISTS (SELECT 1 FROM orders
          |                  WHERE o_custkey = c_custkey
          |                  AND o_orderdate >= TIMESTAMP '1999-01-01')
          |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin))
  )
}
