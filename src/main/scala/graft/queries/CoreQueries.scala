package graft.queries

import graft.Tables
import graft.operators.Allocation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2 parity operators expressed over the driver's synthetic
  * star schema (TESTDATA.md), each paired with a DuckDB oracle in
  * [[CoreQueries.oracles]]. Query names carry the §2 operator ids they
  * exercise. Per-row money columns are `r2(_)` and aggregated money
  * columns `sumR2(_)` on BOTH sides, so the driver's hash compare is
  * independent of float summation order at every scale.
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic 2dp money rounding for oracle comparison: Spark's
    * `round` rounds the double's shortest DECIMAL representation while
    * DuckDB rounds the BINARY value, so they disagree systematically at
    * .xx5 boundaries. `floor(x*100 + 0.50001)/100` is pure IEEE arithmetic
    * — bit-identical in both engines — and the 1e-5 epsilon absorbs
    * summation-order ulp noise for sums that land exactly on half-cent
    * boundaries (which this synthetic data hits systematically). The SQL
    * oracles use the same formula.
    */
  private def r2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 100 + lit(0.50001)) / 100

  /** Order-independent 2dp money AGGREGATION. The r9 spelling
    * `r2(sum(x))` rounded AFTER a double sum, so hash-equality with the
    * oracle depended on both engines accumulating in the same order —
    * true at sf0.01, false at sf1 where per-group sums reach 1e9+ and
    * accumulation-order divergence crosses a half-cent boundary (first
    * full sf1 oracle replay flipped one q03 brand's cents digit), and
    * structurally false on a real cluster where partial-aggregate
    * merge order varies run to run. Rounding each ROW to integer cents
    * first (the same pure-IEEE `r2` kernel, bit-identical in both
    * engines) makes the aggregation a LONG sum — exact, associative,
    * commutative — so the result is one fixed value under any shuffle,
    * AQE re-plan, or partial-agg schedule at any scale. The SQL oracles
    * spell the identical thing (DuckDB widens the BIGINT sum to
    * HUGEINT; the final /100.0 maps the same integer to the same
    * double either way).
    */
  private def sumR2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(floor(c * 100 + lit(0.50001)).cast("long")) / 100.0


  /** A1/A2/A3-style hash aggregation (TPC-H Q1 shape). */
  private def q01(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumR2(col("l_quantity")).as("sum_qty"),
        sumR2(col("l_extendedprice")).as("sum_base_price"),
        sumR2(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** P2/P3/P4: null/comparison filters + projection/rename. */
  private def q02(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_quantity").isNotNull && col("l_quantity") >= 45 &&
        col("l_returnflag") === "R")
      .select(
        col("l_orderkey").as("order_id"),
        col("l_linenumber").as("line_no"),
        col("l_partkey").as("product_id"),
        col("l_quantity").as("quantity"),
        r2(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("net_price"))

  /** J1/J4: broadcast equi-join to a dimension, then rollup. */
  private def q03(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(
        broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"),
        "inner")
      .groupBy(col("p_brand"))
      .agg(
        sumR2(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("num_lines"))

  /** J3/J5/J6-style multi-join chain across dimensions. */
  private def q04(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        sumR2(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("num_orders"))

  /** D1 keyed dedup with a DETERMINISTIC survivor (first order per
    * customer by orderkey) — `dropDuplicates`' arbitrary survivor can't be
    * oracle-compared, so survivor choice is pinned. `min_by`, not a
    * row_number window: the aggregate is map-side-combinable (one
    * candidate per customer rides the shuffle), while the window
    * full-sorts the orders frame.
    */
  private def q05(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(min_by(
        struct(col("o_orderkey"), col("o_totalprice")),
        col("o_orderkey")).as("f"))
      .select(
        col("o_custkey").as("custkey"),
        col("f.o_orderkey").as("first_orderkey"),
        r2(col("f.o_totalprice")).as("first_totalprice"))

  /** U1 bag union (UNION ALL semantics, like PySpark `.union`). */
  private def q06(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.filter(col("o_totalprice") < 500)
      .union(o.filter(col("o_orderstatus") === "F"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        sumR2(col("o_totalprice")).as("total"))
  }

  /** O1/O2/L1: multi-key sort + limit (top-k with deterministic ties). */
  private def q07(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        r2(col("o_totalprice")).as("o_totalprice"))

  /** P5/P6/P7: cast, when/otherwise conditional, derived arithmetic. */
  private def q08(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn(
        "disc_band",
        when(col("l_discount") > 0.05, lit("HI")).otherwise(lit("LO")))
      .withColumn("line_no", col("l_linenumber").cast("string"))
      .groupBy(col("disc_band"), col("line_no"))
      .agg(
        sumR2(col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("l_quantity") * lit(10.0)).as("margin"),
        count(lit(1)).as("n"))

  /** Scalar date functions: month bucketing via date_format (A2 shape). */
  private def q09(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(
        count(lit(1)).as("num_orders"),
        sumR2(col("o_totalprice")).as("revenue"))

  /** A1 order-summary shape: per-order totals + line counts. */
  private def q10(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("order_id"))
      .agg(
        sumR2(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_amount"),
        count(lit(1)).as("num_items"))

  /** EP3 daily-summary shape: fact⋈fact join + per-day rollup. */
  private def q11(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(
        Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(to_date(col("o_orderdate")).as("date"))
      .agg(
        countDistinct(col("o_orderkey")).as("num_orders"),
        sumR2(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_sales"))

  /** Window ranking: top-3 orders per customer (deterministic ties). */
  private def q12(s: SparkSession, d: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(
        col("o_custkey").as("custkey"),
        col("o_orderkey").as("orderkey"),
        r2(col("o_totalprice")).as("totalprice"),
        col("rk"))
  }

  /** Deterministic total order for allocation: (l_orderkey, l_linenumber)
    * is NOT unique in the synthetic data, so ship date + every remaining
    * identifying column serve as tiebreakers (verified unique per partkey).
    */
  private val allocOrder = Seq(
    "l_shipdate", "l_orderkey", "l_linenumber", "l_suppkey",
    "l_extendedprice", "l_quantity")

  private def allocInput(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_suppkey",
        "l_extendedprice", "l_quantity", "l_shipdate")
      .join(
        broadcast(Tables.part(s, d).select(
          col("p_partkey").as("l_partkey"),
          (col("p_size") * 20).cast("double").as("cap"))),
        Seq("l_partkey"),
        "inner")

  /** §2.8 flagship: greedy sequential allocation (fill-or-cancel per part,
    * shipdate order, capacity = p_size*20). Not WINDOW-expressible (greedy
    * releases a cancelled line's quantity to later lines), but it IS a
    * linear recurrence — the oracle walks each part's lines with a
    * recursive CTE, so the custom operator is fully hash-checked too
    * (plus AllocationSpec and the candy golden e2e test).
    */
  private def q13(s: SparkSession, d: String): DataFrame =
    Allocation
      .greedy(
        allocInput(s, d),
        keyCol = "l_partkey",
        qtyCol = "l_quantity",
        capCol = "cap",
        orderCols = allocOrder)
      .select("l_orderkey", "l_partkey", "l_linenumber", "alloc_qty")

  /** Cumulative-threshold allocation — the relational (window) variant,
    * fully oracle-checkable.
    */
  private def q14(s: SparkSession, d: String): DataFrame =
    Allocation
      .cumulativeThreshold(
        allocInput(s, d),
        keyCol = "l_partkey",
        qtyCol = "l_quantity",
        capCol = "cap",
        orderCols = allocOrder)
      .select("l_orderkey", "l_partkey", "l_linenumber", "alloc_qty")

  /** J2/P6 stock writeback: capacity − Σ allocated, left join + coalesce
    * (over the window-variant allocation so the whole chain is SQL).
    */
  private def q15(s: SparkSession, d: String): DataFrame = {
    val alloc = Allocation
      .cumulativeThreshold(
        allocInput(s, d),
        keyCol = "l_partkey",
        qtyCol = "l_quantity",
        capCol = "cap",
        orderCols = allocOrder)
      .select(col("l_partkey").as("partkey"), col("alloc_qty"))
    val caps = Tables.part(s, d).select(
      col("p_partkey").as("partkey"),
      (col("p_size") * 20).cast("double").as("cap"))
    Allocation
      .remainingCapacity(caps, alloc, keyCol = "partkey", capCol = "cap")
      .select("partkey", "remaining_cap")
  }

  /** Set operations: INTERSECT / EXCEPT (distinct semantics), beyond the
    * reference's bag-union-only surface.
    */
  private def q38(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val highValue = o.filter(col("o_totalprice") > 400000).select("o_custkey")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val both = highValue.intersect(urgent)
      .withColumn("relation", lit("both"))
    val onlyHigh = highValue.except(urgent)
      .withColumn("relation", lit("high_only"))
    both.union(onlyHigh)
  }

  /** ROLLUP: hierarchical subtotals in one aggregation pass. */
  private def q39(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sumR2(col("l_extendedprice")).as("total"))

  /** Pivot: one column per order priority, revenue per status row.
    * Pivot values pinned explicitly so the output schema is static (at
    * scale an unpinned pivot needs an extra distinct-values job).
    */
  private def q40(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(sumR2(col("o_totalprice")))
      .withColumnsRenamed(Map(
        "1-URGENT" -> "p1", "2-HIGH" -> "p2", "3-MEDIUM" -> "p3",
        "4-NOT SPECIFIED" -> "p4", "5-LOW" -> "p5"))

  val defs: Map[String, Q] = Map(
    "q01_agg_rollup" -> q01,
    "q02_filter_project" -> q02,
    "q03_join_dim" -> q03,
    "q04_join_chain" -> q04,
    "q05_dedup_keyed" -> q05,
    "q06_union_bag" -> q06,
    "q07_sort_topk" -> q07,
    "q08_case_arith" -> q08,
    "q09_date_rollup" -> q09,
    "q10_order_summary" -> q10,
    "q11_daily_summary" -> q11,
    "q12_window_rank" -> q12,
    "q13_alloc_greedy" -> q13,
    "q14_alloc_cumsum" -> q14,
    "q15_stock_writeback" -> q15,
    "q38_set_ops" -> q38,
    "q39_rollup" -> q39,
    "q40_pivot" -> q40
  )

  private val cumsumAllocSql =
    """SELECT l.l_orderkey, l.l_partkey, l.l_linenumber,
      |CASE WHEN sum(l.l_quantity) OVER (PARTITION BY l.l_partkey
      |  ORDER BY l.l_shipdate, l.l_orderkey, l.l_linenumber, l.l_suppkey,
      |           l.l_extendedprice, l.l_quantity
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) <= p.p_size * 20
      |  THEN l.l_quantity ELSE 0 END AS alloc_qty
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey""".stripMargin

  val oracles: Map[String, String] = Map(
    "q01_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |sum(CAST(floor(l_quantity * 100 + 0.50001) AS BIGINT)) / 100.0 AS sum_qty,
        |sum(CAST(floor(l_extendedprice * 100 + 0.50001) AS BIGINT)) / 100.0 AS sum_base_price,
        |sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.50001) AS BIGINT)) / 100.0 AS sum_disc_price,
        |count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey AS order_id, l_linenumber AS line_no,
        |l_partkey AS product_id, l_quantity AS quantity,
        |floor((l_extendedprice * (1 - l_discount)) * 100 + 0.50001) / 100 AS net_price
        |FROM lineitem
        |WHERE l_quantity IS NOT NULL AND l_quantity >= 45 AND l_returnflag = 'R'""".stripMargin,
    "q03_join_dim" ->
      """SELECT p_brand,
        |sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.50001) AS BIGINT)) / 100.0 AS revenue,
        |count(*) AS num_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "q04_join_chain" ->
      """SELECT r_name, sum(CAST(floor(o_totalprice * 100 + 0.50001) AS BIGINT)) / 100.0 AS revenue,
        |count(*) AS num_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q05_dedup_keyed" ->
      """SELECT o_custkey AS custkey, o_orderkey AS first_orderkey,
        |floor((o_totalprice) * 100 + 0.50001) / 100 AS first_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderkey) AS rn FROM orders) t
        |WHERE rn = 1""".stripMargin,
    "q06_union_bag" ->
      """SELECT o_orderstatus, count(*) AS n, sum(CAST(floor(o_totalprice * 100 + 0.50001) AS BIGINT)) / 100.0 AS total
        |FROM (SELECT * FROM orders WHERE o_totalprice < 500
        |      UNION ALL
        |      SELECT * FROM orders WHERE o_orderstatus = 'F') t
        |GROUP BY o_orderstatus""".stripMargin,
    "q07_sort_topk" ->
      """SELECT o_orderkey, o_custkey, floor((o_totalprice) * 100 + 0.50001) / 100 AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q08_case_arith" ->
      """SELECT CASE WHEN l_discount > 0.05 THEN 'HI' ELSE 'LO' END AS disc_band,
        |CAST(l_linenumber AS VARCHAR) AS line_no,
        |sum(CAST(floor((l_extendedprice * (1 - l_discount) - l_quantity * 10.0) * 100 + 0.50001) AS BIGINT)) / 100.0 AS margin,
        |count(*) AS n
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q09_date_rollup" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |count(*) AS num_orders, sum(CAST(floor(o_totalprice * 100 + 0.50001) AS BIGINT)) / 100.0 AS revenue
        |FROM orders GROUP BY 1""".stripMargin,
    "q10_order_summary" ->
      """SELECT l_orderkey AS order_id,
        |sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.50001) AS BIGINT)) / 100.0 AS total_amount,
        |count(*) AS num_items
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "q11_daily_summary" ->
      """SELECT CAST(o_orderdate AS DATE) AS date,
        |count(DISTINCT o.o_orderkey) AS num_orders,
        |sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.50001) AS BIGINT)) / 100.0 AS total_sales
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin,
    "q12_window_rank" ->
      """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        |floor((o_totalprice) * 100 + 0.50001) / 100 AS totalprice, rk
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk FROM orders) t
        |WHERE rk <= 3""".stripMargin,
    "q38_set_ops" ->
      """WITH hv AS (SELECT o_custkey FROM orders WHERE o_totalprice > 400000),
        |u AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT o_custkey, 'both' AS relation FROM (SELECT * FROM hv INTERSECT SELECT * FROM u) t
        |UNION ALL
        |SELECT o_custkey, 'high_only' AS relation FROM (SELECT * FROM hv EXCEPT SELECT * FROM u) t""".stripMargin,
    "q39_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |sum(CAST(floor(l_extendedprice * 100 + 0.50001) AS BIGINT)) / 100.0 AS total
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q40_pivot" ->
      """SELECT o_orderstatus,
        |sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(floor(o_totalprice * 100 + 0.50001) AS BIGINT) END) / 100.0 AS p1,
        |sum(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(floor(o_totalprice * 100 + 0.50001) AS BIGINT) END) / 100.0 AS p2,
        |sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(floor(o_totalprice * 100 + 0.50001) AS BIGINT) END) / 100.0 AS p3,
        |sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(floor(o_totalprice * 100 + 0.50001) AS BIGINT) END) / 100.0 AS p4,
        |sum(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(floor(o_totalprice * 100 + 0.50001) AS BIGINT) END) / 100.0 AS p5
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    // the greedy recurrence, row by row per part: remaining capacity
    // threads through the recursive CTE exactly as it threads through
    // Allocation.greedy's per-key streaming state
    "q13_alloc_greedy" ->
      """WITH RECURSIVE base AS (
        |  SELECT l.l_orderkey, l.l_partkey, l.l_linenumber, l.l_quantity,
        |         CAST(p.p_size * 20 AS DOUBLE) AS cap,
        |         row_number() OVER (PARTITION BY l.l_partkey
        |           ORDER BY l.l_shipdate, l.l_orderkey, l.l_linenumber, l.l_suppkey,
        |                    l.l_extendedprice, l.l_quantity) AS rn
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |),
        |rec AS (
        |  SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, rn,
        |         CASE WHEN l_quantity > 0 AND l_quantity <= cap THEN l_quantity ELSE CAST(0 AS DOUBLE) END AS alloc_qty,
        |         cap - CASE WHEN l_quantity > 0 AND l_quantity <= cap THEN l_quantity ELSE 0 END AS remaining
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.l_orderkey, b.l_partkey, b.l_linenumber, b.l_quantity, b.rn,
        |         CASE WHEN b.l_quantity > 0 AND b.l_quantity <= r.remaining THEN b.l_quantity ELSE CAST(0 AS DOUBLE) END,
        |         r.remaining - CASE WHEN b.l_quantity > 0 AND b.l_quantity <= r.remaining THEN b.l_quantity ELSE 0 END
        |  FROM base b JOIN rec r ON b.l_partkey = r.l_partkey AND b.rn = r.rn + 1
        |)
        |SELECT l_orderkey, l_partkey, l_linenumber, alloc_qty FROM rec""".stripMargin,
    "q14_alloc_cumsum" -> cumsumAllocSql,
    "q15_stock_writeback" ->
      s"""WITH alloc AS ($cumsumAllocSql),
         |used AS (SELECT l_partkey AS partkey, sum(alloc_qty) AS used
         |         FROM alloc GROUP BY 1)
         |SELECT p.p_partkey AS partkey,
         |CAST(p.p_size * 20 AS DOUBLE) - coalesce(u.used, 0) AS remaining_cap
         |FROM part p LEFT JOIN used u ON p.p_partkey = u.partkey""".stripMargin
  )
}
