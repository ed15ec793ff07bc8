package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Q._

/** Core relational surface: scan/filter/project, joins (all types),
  * aggregation (incl. rollup/cube/grouping sets), windows, sort/limit,
  * set operations. SURVEY.md §2.B rows "Joins", "Aggregations",
  * "Windows", "Sort/limit/top-k", "Set ops".
  *
  * Scale notes (local[32] tests, 100 TB posture):
  *   - dimension joins (region/nation/supplier/customer) are explicitly
  *     `broadcast()` — at production scale these stay far below the
  *     broadcast threshold while fact tables shuffle;
  *   - aggregations rely on partial (map-side) aggregation, which Spark
  *     plans automatically for all algebraic aggs used here;
  *   - top-k per group uses window + filter (no global sort); global
  *     top-k uses orderBy+limit which Catalyst plans as
  *     TakeOrderedAndProject (no full shuffle of the sorted data).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q01_pricing_summary",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_shipdate" <= to_timestamp(lit("2001-09-02 00:00:00")))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            dsum($"l_quantity").as("sum_qty"),
            dsum($"l_extendedprice").as("sum_base_price"),
            dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
            dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))
              .as("sum_charge"),
            davg($"l_quantity").as("avg_qty"),
            davg($"l_extendedprice").as("avg_price"),
            davg($"l_discount").as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_qty,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
               CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_charge,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) / CAST(COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
               CAST(CAST(SUM(CAST(l_discount AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) / CAST(COUNT(l_discount) AS DOUBLE) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """)),
    // ----------------------------------------------------------------
    Q(
      "q02_filter_project",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter(
            $"l_discount".between(0.02, 0.06) && $"l_quantity" < 10.0 &&
              $"l_shipdate" >= to_timestamp(lit("1997-01-01 00:00:00")))
          .select(
            $"l_orderkey", $"l_linenumber",
            ($"l_extendedprice" * $"l_discount").as("revenue"),
            tstr($"l_shipdate").as("ship_ts"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * l_discount AS revenue,
               strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_ts
        FROM lineitem
        WHERE l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 10.0
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        ORDER BY l_orderkey, l_linenumber
      """)),
    // ----------------------------------------------------------------
    Q(
      "q03_top_revenue_orders",
      (s, dir) => {
        import s.implicits._
        val orders = t(s, dir, "orders")
          .filter($"o_orderdate" < to_timestamp(lit("2000-01-01 00:00:00")))
        // Aggregation pushed BELOW the join: the grouping keys are
        // functionally determined by l_orderkey, so revenue-per-order is
        // computed on lineitem alone (600k rows → 150k pre-aggregated)
        // and only the aggregate joins — a rewrite Catalyst doesn't do
        // itself, and exactly equal because the decimal sum is exact.
        val rev = t(s, dir, "lineitem")
          .groupBy($"l_orderkey")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        // customer is a dim at any scale relative to lineitem: broadcast.
        broadcast(t(s, dir, "customer"))
          .join(orders, $"c_custkey" === $"o_custkey")
          .join(rev, $"o_orderkey" === $"l_orderkey")
          .select(
            $"o_orderkey", tstr($"o_orderdate").as("order_ts"),
            $"c_mktsegment", $"revenue")
          .orderBy($"revenue".desc, $"o_orderkey")
          .limit(10)
      },
      Some("""
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts,
               c_mktsegment,
               CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        GROUP BY o_orderkey, o_orderdate, c_mktsegment
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
      """)),
    // ----------------------------------------------------------------
    Q(
      "q04_regional_revenue",
      (s, dir) => {
        import s.implicits._
        // TPC-H Q5 shape: fact lineitem⋈orders shuffles; all dims broadcast.
        val li = t(s, dir, "lineitem")
        val orders = t(s, dir, "orders")
        val cust = broadcast(t(s, dir, "customer"))
        val supp = broadcast(t(s, dir, "supplier"))
        val nation = broadcast(t(s, dir, "nation"))
        val region = broadcast(t(s, dir, "region"))
        li.join(orders, $"l_orderkey" === $"o_orderkey")
          .join(cust, $"o_custkey" === $"c_custkey")
          .join(supp, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
          .join(nation, $"s_nationkey" === $"n_nationkey")
          .join(region, $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"r_name", $"n_name")
      },
      Some("""
        SELECT r_name, n_name,
               CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
      """)),
    // ----------------------------------------------------------------
    Q(
      "q05_left_join_counts",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_custkey")
          .agg(
            count($"o_orderkey").as("n_orders"),
            dsum(coalesce($"o_totalprice", lit(0.0))).as("total_spent"))
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
               CAST(CAST(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
        ORDER BY c_custkey
      """)),
    // ----------------------------------------------------------------
    Q(
      "q06_semi_join",
      (s, dir) => {
        import s.implicits._
        val bigOrders = t(s, dir, "orders").filter($"o_totalprice" > 400000.0)
        t(s, dir, "customer")
          .join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name", $"c_mktsegment")
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
        ORDER BY c_custkey
      """)),
    // ----------------------------------------------------------------
    Q(
      "q07_anti_join",
      (s, dir) => {
        import s.implicits._
        // customers with no high-value order — complement of q06, non-empty.
        val bigOrders = t(s, dir, "orders").filter($"o_totalprice" > 400000.0)
        t(s, dir, "customer")
          .join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name", $"c_nationkey")
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_nationkey
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
        ORDER BY c_custkey
      """)),
    // ----------------------------------------------------------------
    Q(
      "q08_full_outer",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer").groupBy($"c_nationkey")
          .agg(count(lit(1)).as("n_customers"))
        val su = t(s, dir, "supplier").groupBy($"s_nationkey")
          .agg(count(lit(1)).as("n_suppliers"))
        c.join(su, $"c_nationkey" === $"s_nationkey", "full_outer")
          .select(
            coalesce($"c_nationkey", $"s_nationkey").as("nationkey"),
            coalesce($"n_customers", lit(0L)).as("n_customers"),
            coalesce($"n_suppliers", lit(0L)).as("n_suppliers"))
          .orderBy($"nationkey")
      },
      Some("""
        WITH c AS (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey),
             su AS (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey)
        SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
               COALESCE(n_customers, 0) AS n_customers,
               COALESCE(n_suppliers, 0) AS n_suppliers
        FROM c FULL OUTER JOIN su ON c_nationkey = s_nationkey
        ORDER BY nationkey
      """)),
    // ----------------------------------------------------------------
    Q(
      "q09_cross_join",
      (s, dir) => {
        import s.implicits._
        val r1 = t(s, dir, "region").select($"r_name".as("r1"))
        val r2 = t(s, dir, "region").select($"r_name".as("r2"))
        r1.crossJoin(r2).filter($"r1" < $"r2").orderBy($"r1", $"r2")
      },
      Some("""
        SELECT a.r_name AS r1, b.r_name AS r2
        FROM region a CROSS JOIN region b
        WHERE a.r_name < b.r_name
        ORDER BY r1, r2
      """)),
    // ----------------------------------------------------------------
    Q(
      "q10_window_topk",
      (s, dir) => {
        import s.implicits._
        // per-group top-k: window + filter — no global sort, scales with
        // the number of groups, not a single-reducer orderBy.
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .withColumn("rnk", rank().over(w).cast("long"))
          .withColumn("drnk", dense_rank().over(w).cast("long"))
          .filter($"rn" <= 3)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn".cast("long").as("rn"),
            $"rnk", $"drnk")
          .orderBy($"o_custkey", $"rn")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(rn AS BIGINT) AS rn, CAST(rnk AS BIGINT) AS rnk, CAST(drnk AS BIGINT) AS drnk
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        ) WHERE rn <= 3
        ORDER BY o_custkey, rn
      """)),
    // ----------------------------------------------------------------
    Q(
      "q11_window_analytic",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        t(s, dir, "orders")
          .select(
            $"o_custkey", $"o_orderkey",
            tstr($"o_orderdate").as("order_ts"),
            tstr(lag($"o_orderdate", 1).over(w)).as("prev_ts"),
            tstr(lead($"o_orderdate", 1).over(w)).as("next_ts"),
            first($"o_orderkey").over(w).as("first_ok"),
            last($"o_orderkey").over(w).as("last_ok"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts,
               strftime(LAG(o_orderdate, 1) OVER w, '%Y-%m-%d %H:%M:%S') AS prev_ts,
               strftime(LEAD(o_orderdate, 1) OVER w, '%Y-%m-%d %H:%M:%S') AS next_ts,
               FIRST_VALUE(o_orderkey) OVER w AS first_ok,
               LAST_VALUE(o_orderkey) OVER w AS last_ok
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
      """)),
    // ----------------------------------------------------------------
    Q(
      "q12_window_running",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .select(
            $"user_id", $"event_id",
            sum($"value".cast(Dec)).over(w).cast("double").as("running_value"),
            count(lit(1)).over(w).as("running_n"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""
        SELECT user_id, event_id,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) OVER w AS VARCHAR) AS DOUBLE) AS running_value,
               COUNT(*) OVER w AS running_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id
      """)),
    // ----------------------------------------------------------------
    Q(
      "q13_sort_limit",
      (s, dir) => {
        import s.implicits._
        // global top-k: Catalyst plans TakeOrderedAndProject — per
        // partition heaps + driver merge, never a full global sort.
        t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
          .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
          .limit(100)
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 100
      """)),
    // ----------------------------------------------------------------
    Q(
      "q14_union_all",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
          .select($"c_nationkey".cast("int").as("nationkey"), lit("customer").as("kind"))
        // unionByName: column order differs on purpose.
        val su = t(s, dir, "supplier")
          .select(lit("supplier").as("kind"), $"s_nationkey".cast("int").as("nationkey"))
        c.unionByName(su)
          .groupBy($"nationkey", $"kind").agg(count(lit(1)).as("n"))
          .orderBy($"nationkey", $"kind")
      },
      Some("""
        SELECT nationkey, kind, COUNT(*) AS n FROM (
          SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
          UNION ALL
          SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
        ) GROUP BY nationkey, kind
        ORDER BY nationkey, kind
      """)),
    // ----------------------------------------------------------------
    Q(
      "q15_intersect",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer").select($"c_nationkey".cast("int").as("nationkey"))
          .intersect(t(s, dir, "supplier").select($"s_nationkey".cast("int").as("nationkey")))
          .orderBy($"nationkey")
      },
      Some("""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
        ORDER BY nationkey
      """)),
    // ----------------------------------------------------------------
    Q(
      "q16_except",
      (s, dir) => {
        import s.implicits._
        // custkeys that placed a high-value order but never a low-value one.
        val o = t(s, dir, "orders")
        o.filter($"o_totalprice" > 400000.0).select($"o_custkey".as("custkey"))
          .except(o.filter($"o_totalprice" < 50000.0).select($"o_custkey".as("custkey")))
          .orderBy($"custkey")
      },
      Some("""
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice < 50000.0
        ORDER BY custkey
      """)),
    // ----------------------------------------------------------------
    Q(
      "q17_distinct",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .select($"c_mktsegment", $"c_nationkey".cast("int").as("c_nationkey"))
          .distinct()
          .orderBy($"c_mktsegment", $"c_nationkey")
      },
      Some("""
        SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        ORDER BY c_mktsegment, c_nationkey
      """)),
    // ----------------------------------------------------------------
    Q(
      "q18_rollup",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .rollup($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"),
            grouping($"o_orderstatus").cast("long").as("g_status"),
            grouping($"o_orderpriority").cast("long").as("g_prio"))
          .select(
            coalesce($"o_orderstatus", lit("ALL")).as("status"),
            coalesce($"o_orderpriority", lit("ALL")).as("priority"),
            $"n", $"total", $"g_status", $"g_prio")
          .orderBy($"g_status", $"g_prio", $"status", $"priority")
      },
      Some("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS total,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY g_status, g_prio, status, priority
      """)),
    // ----------------------------------------------------------------
    Q(
      "q19_cube",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .cube($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("qty"),
            grouping($"l_returnflag").cast("long").as("g_rf"),
            grouping($"l_linestatus").cast("long").as("g_ls"))
          .select(
            coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
            coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
            $"n", $"qty", $"g_rf", $"g_ls")
          .orderBy($"g_rf", $"g_ls", $"returnflag", $"linestatus")
      },
      Some("""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS qty,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY g_rf, g_ls, returnflag, linestatus
      """)),
    // ----------------------------------------------------------------
    Q(
      "q20_grouping_sets",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").createOrReplaceTempView("orders_gs")
        s.sql("""
          SELECT COALESCE(o_orderstatus, 'ALL') AS status,
                 COALESCE(o_orderpriority, 'ALL') AS priority,
                 COUNT(*) AS n,
                 CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
                 CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
          FROM orders_gs
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY g_status, g_prio, status, priority
        """)
      },
      Some("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_prio, status, priority
      """)),
    // ----------------------------------------------------------------
    Q(
      "q21_having",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy($"o_custkey")
          .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total"))
          .filter($"n_orders" >= 15)
          .orderBy($"o_custkey")
      },
      Some("""
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS total
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) >= 15
        ORDER BY o_custkey
      """)),
    // ----------------------------------------------------------------
    Q(
      "q22_count_distinct",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .groupBy($"c_mktsegment")
          .agg(
            countDistinct($"c_nationkey").as("n_nations"),
            count(lit(1)).as("n_customers"))
          .orderBy($"c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations,
               COUNT(*) AS n_customers
        FROM customer GROUP BY c_mktsegment
        ORDER BY c_mktsegment
      """)),
    // ----------------------------------------------------------------
    // approx_count_distinct self-verifying envelope: HLL estimates
    // differ between engines by design, so the emitted row carries the
    // EXACT distinct count plus a deterministic within-5%-envelope
    // verdict on the rsd=0.01 sketch (theoretical std error ~1%; 5%
    // is a >4-sigma bound). The oracle replays the exact side and the
    // always-true bound, so the row hash-matches while the sketch
    // still runs and is still checked every round.
    Q(
      "q23_approx_distinct",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            approx_count_distinct($"l_orderkey", 0.01).as("approx"),
            countDistinct($"l_orderkey").as("exact_orders"))
          .select(
            $"l_returnflag",
            $"exact_orders",
            (abs($"approx" - $"exact_orders") <= $"exact_orders" * 0.05)
              .as("within_5pct"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders,
               TRUE AS within_5pct
        FROM lineitem GROUP BY 1 ORDER BY 1
      """))
  )
}
