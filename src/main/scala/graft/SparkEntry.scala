package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Relational, SpendingReport}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching ANSI-SQL oracle in
  * `oracleSql` (runnable by DuckDB over the same parquet tables, named
  * bare: events/lineitem/...). Column names are aligned between the
  * Spark plan and the SQL because the driver's compare sorts columns by
  * name before hashing.
  *
  * The transactions view used by the spending-report queries (the
  * reference's upload-summary analog, SURVEY.md §7.1) is, in SQL:
  *   SELECT cast(ts AS date) txn_date, event_type category,
  *          'u' || user_id vendor, value amount FROM events
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference pipeline: fold → report → enrichment stub. */
  def entry(spark: SparkSession): DataFrame =
    SpendingReport.enriched(Tables.transactions(spark, "/root/testdata/sf0.001"))

  private def tx(s: SparkSession, dir: String): DataFrame = Tables.transactions(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- spending report core (SURVEY §2.4-§2.6) ---
    "q_global_summary" -> ((s, d) => SpendingReport.globalSummary(tx(s, d))),
    "q_category_totals" -> ((s, d) => SpendingReport.keyTotals(tx(s, d), "category")),
    "q_vendor_totals" -> ((s, d) => SpendingReport.keyTotals(tx(s, d), "vendor")),
    "q_distinct_categories" -> ((s, d) => SpendingReport.distinctKeys(tx(s, d), "category")),
    "q_unique_sets" -> ((s, d) => SpendingReport.uniqueKeySets(tx(s, d))),
    "q_mean_category" -> ((s, d) => SpendingReport.zeroImputedMean(tx(s, d), "category")),
    "q_mean_vendor" -> ((s, d) => SpendingReport.zeroImputedMean(tx(s, d), "vendor")),
    "q_pct_change_category" -> ((s, d) => SpendingReport.pctChangeLatest(tx(s, d), "category")),
    "q_pct_change_vendor" -> ((s, d) => SpendingReport.pctChangeLatest(tx(s, d), "vendor")),
    "q_top5_vendors_asc" -> ((s, d) => SpendingReport.top5Asc(tx(s, d), "vendor")),
    "q_dates_catalog" -> ((s, d) =>
      tx(s, d).select(org.apache.spark.sql.functions.col("txn_date").as("begin_date"),
                      org.apache.spark.sql.functions.col("txn_date").as("end_date")).distinct()),
    // --- relational coverage (SURVEY §2.1-§2.3, §2.6-§2.7) ---
    "q_revenue_by_order" -> ((s, d) =>
      Relational.revenueByOrder(Tables.lineitem(s, d), "1996-01-01", "1997-01-01")),
    "q_revenue_type_supplier" -> ((s, d) =>
      Relational.revenueByTypeAndSupplier(Tables.lineitem(s, d), Tables.part(s, d), Tables.supplier(s, d))),
    "q_customers_by_region" -> ((s, d) =>
      Relational.customersByRegion(Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))),
    "q_semi_orders_big_items" -> ((s, d) =>
      Relational.ordersWithBigItems(Tables.orders(s, d), Tables.lineitem(s, d), 45.0)),
    "q_anti_orders_no_items" -> ((s, d) =>
      Relational.ordersWithoutItems(Tables.orders(s, d), Tables.lineitem(s, d))),
    "q_top10_orders" -> ((s, d) => Relational.topOrdersByPrice(Tables.orders(s, d), 10)),
    "q_top3_orders_per_customer" -> ((s, d) => Relational.topOrdersPerCustomer(Tables.orders(s, d), 3)),
    "q_rollup_lineitem" -> ((s, d) => Relational.rollupQtyByFlagStatus(Tables.lineitem(s, d))),
    "q_union_nationkeys" -> ((s, d) =>
      Relational.activeNationKeys(Tables.supplier(s, d), Tables.customer(s, d))),
    "q_order_point_lookup" -> ((s, d) => Relational.orderPointLookup(Tables.orders(s, d))),
  )

  private val txSql =
    "SELECT cast(ts AS date) AS txn_date, event_type AS category, " +
      "'u' || user_id AS vendor, value AS amount FROM events"

  def oracleSql: Map[String, String] = Map(
    "q_global_summary" ->
      s"""SELECT cast(sum(cast(amount AS DECIMAL(14,2))) AS double) AS total_spent,
         |       count(*) AS total_transactions,
         |       min(txn_date) AS begin_date,
         |       max(txn_date) AS end_date
         |FROM ($txSql)""".stripMargin,
    "q_category_totals" ->
      s"""WITH t AS (SELECT category, cast(sum(cast(amount AS DECIMAL(14,2))) AS double) AS total
         |           FROM ($txSql) GROUP BY category)
         |SELECT category, total,
         |       row_number() OVER (ORDER BY total ASC, category ASC) AS rank_asc
         |FROM t""".stripMargin,
    "q_vendor_totals" ->
      s"""WITH t AS (SELECT vendor, cast(sum(cast(amount AS DECIMAL(14,2))) AS double) AS total
         |           FROM ($txSql) GROUP BY vendor)
         |SELECT vendor, total,
         |       row_number() OVER (ORDER BY total ASC, vendor ASC) AS rank_asc
         |FROM t""".stripMargin,
    "q_distinct_categories" ->
      s"SELECT DISTINCT category FROM ($txSql)",
    "q_unique_sets" ->
      s"""SELECT list_sort(list(DISTINCT category)) AS unique_categories,
         |       count(DISTINCT category) AS n_categories,
         |       list_sort(list(DISTINCT vendor)) AS unique_vendors,
         |       count(DISTINCT vendor) AS n_vendors
         |FROM ($txSql)""".stripMargin,
    "q_mean_category" ->
      s"""SELECT category,
         |       cast(sum(cast(amount AS DECIMAL(14,2))) AS double) /
         |             (SELECT cast(count(DISTINCT txn_date) AS double) FROM ($txSql))
         |         AS mean_amount
         |FROM ($txSql) GROUP BY category""".stripMargin,
    "q_mean_vendor" ->
      s"""SELECT vendor,
         |       cast(sum(cast(amount AS DECIMAL(14,2))) AS double) /
         |             (SELECT cast(count(DISTINCT txn_date) AS double) FROM ($txSql))
         |         AS mean_amount
         |FROM ($txSql) GROUP BY vendor""".stripMargin,
    "q_pct_change_category" -> pctChangeSql("category"),
    "q_pct_change_vendor" -> pctChangeSql("vendor"),
    "q_top5_vendors_asc" ->
      s"""WITH t AS (SELECT vendor, cast(sum(cast(amount AS DECIMAL(14,2))) AS double) AS total
         |           FROM ($txSql) GROUP BY vendor)
         |SELECT vendor, total FROM t ORDER BY total ASC, vendor ASC LIMIT 5""".stripMargin,
    "q_dates_catalog" ->
      s"SELECT DISTINCT txn_date AS begin_date, txn_date AS end_date FROM ($txSql)",
    "q_revenue_by_order" ->
      """SELECT l_orderkey,
        |       cast(sum(cast(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS double) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey""".stripMargin,
    "q_revenue_type_supplier" ->
      """SELECT p_type, s_name,
        |       cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS double) AS sum_qty,
        |       cast(sum(cast(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS double) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY p_type, s_name""".stripMargin,
    "q_customers_by_region" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |       cast(sum(cast(c_acctbal AS DECIMAL(18,2))) AS double) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q_semi_orders_big_items" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45.0)
        |GROUP BY o_orderpriority""".stripMargin,
    "q_anti_orders_no_items" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)""".stripMargin,
    "q_top10_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_top3_orders_per_customer" ->
      """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |                  row_number() OVER (PARTITION BY o_custkey
        |                                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |           FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice, rn FROM r WHERE rn <= 3""".stripMargin,
    "q_rollup_lineitem" ->
      """SELECT l_returnflag, l_linestatus,
        |       cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS double) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_union_nationkeys" ->
      """SELECT cast(s_nationkey AS bigint) AS nationkey FROM supplier
        |UNION
        |SELECT cast(c_nationkey AS bigint) AS nationkey FROM customer""".stripMargin,
    "q_order_point_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders)""".stripMargin,
  )

  /** W1/W2 oracle: dense date×key grid, 0-imputed, lag pct-change of the
    * latest date per key (SURVEY §2.5; engine semantics: 0/missing
    * predecessor -> 0.0). */
  private def pctChangeSql(key: String): String =
    s"""WITH d AS (SELECT DISTINCT txn_date FROM ($txSql)),
       |     k AS (SELECT DISTINCT $key FROM ($txSql)),
       |     s AS (SELECT txn_date, $key, cast(sum(cast(amount AS DECIMAL(14,2))) AS double) AS amount
       |           FROM ($txSql) GROUP BY txn_date, $key),
       |     g AS (SELECT d.txn_date, k.$key, coalesce(s.amount, 0.0) AS amount
       |           FROM d CROSS JOIN k
       |           LEFT JOIN s ON s.txn_date = d.txn_date AND s.$key = k.$key),
       |     p AS (SELECT $key, amount,
       |                  lag(amount) OVER (PARTITION BY $key ORDER BY txn_date) AS prev,
       |                  row_number() OVER (PARTITION BY $key ORDER BY txn_date DESC) AS rn
       |           FROM g)
       |SELECT $key,
       |       CASE WHEN prev IS NULL OR prev = 0.0 THEN 0.0
       |            ELSE (amount - prev) / prev END AS pct_change
       |FROM p WHERE rn = 1""".stripMargin
}
