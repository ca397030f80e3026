package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators: applying a CDC batch to an SCD2
  * dimension history (the MERGE pattern), and bounded top-k per group
  * through a custom Catalyst aggregate.
  *
  * Scale shapes: q111 touches the history's CURRENT slice only — closed
  * rows stream through untouched, and the one join is new-batch-sized
  * against current-sized on the natural key; at 100 TB the history is a
  * bucketed table on that key and the merge never re-shuffles it. q112
  * replaces the window-sort spelling of "top 3 per group" (a full sort
  * shuffle of the fact table) with an O(k)-state aggregation that
  * map-side combines before the shuffle.
  */
object WarehouseQueries {
  private type Q = (SparkSession, String) => DataFrame

  private val cutoff = "2024-01-25"

  /** SCD2 MERGE: history = per-user event_type validity intervals built
    * from events before the cutoff; batch = each user's latest event at
    * or after it. Changed users get their current row closed out at the
    * batch timestamp plus a new open row; unchanged and absent users
    * pass through; brand-new users insert. Exactly the upsert a
    * dimension table takes every load cycle.
    */
  /** The SCD2 history shared by q111 (merge) and q113 (point-in-time
    * join): per-user event_type validity intervals from pre-cutoff
    * events.
    */
  private def history(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val runs = ev.filter(col("ts") < lit(cutoff).cast("timestamp"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("chg",
        when(col("prev_type").isNull || col("prev_type") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    runs
      .groupBy(col("user_id"), col("run_id"), col("event_type"))
      .agg(min(col("ts")).as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("run_id"))))
  }

  private def q111(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val hist = history(s, d)
    val closed = hist.filter(col("valid_to").isNotNull)
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"), lit(false).as("is_current"))
    val cur = hist.filter(col("valid_to").isNull)
      .select(col("user_id"), col("event_type"), col("valid_from"))
    // latest batch event per user via max_by (combinable one-candidate
    // aggregate), not a row_number window (full sort of the batch)
    val batch = ev.filter(col("ts") >= lit(cutoff).cast("timestamp"))
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_type"), col("ts")),
        struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.event_type").as("new_type"),
        col("m.ts").as("new_ts"))
    val changed = col("new_type").isNotNull && col("event_type").isNotNull &&
      col("new_type") =!= col("event_type")
    val merged = cur.join(batch, Seq("user_id"), "full_outer")
      .select(explode(filter(array(
        // the carried-over current row, closed out iff the batch changed it
        when(col("event_type").isNotNull, struct(
          col("user_id").as("user_id"),
          col("event_type").as("event_type"),
          col("valid_from").as("valid_from"),
          when(changed, col("new_ts")).otherwise(lit(null).cast("timestamp"))
            .as("valid_to"),
          (!changed).as("is_current"))),
        // the new version: changed user, or first-ever sighting
        when(col("new_type").isNotNull &&
          (col("event_type").isNull || changed), struct(
          col("user_id").as("user_id"),
          col("new_type").as("event_type"),
          col("new_ts").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"),
          lit(true).as("is_current")))),
        x => x.isNotNull)).as("r"))
      .select(col("r.user_id"), col("r.event_type"), col("r.valid_from"),
        col("r.valid_to"), col("r.is_current"))
    closed.unionAll(merged)
  }

  /** Point-in-time (feature-store) join: every post-cutoff event is
    * enriched with the SCD2 dimension version that was valid AT ITS
    * TIMESTAMP — the join that makes training data leakage-free. The
    * Spark-first plan is the as-of UNION trick, not an interval join:
    * version rows and event rows merge into one stream, one window pass
    * per user carries the last-seen version forward, and events read it
    * off — a single sort shuffle keyed by user, no inequality-join blowup
    * and no per-event history probe. Version rows order BEFORE events at
    * an equal timestamp (negative sentinel event_id), which pins the
    * `valid_from <= ts < valid_to` boundary semantics exactly. The
    * sentinel is `Long.MinValue + run_id`, not a constant: if two SCD2
    * runs ever share a valid_from (possible when distinct-nanos source
    * timestamps collide after µs truncation), the later run's version
    * row must sort LAST so `last(dim_type)` picks it — matching the
    * oracle's half-open interval join, where the earlier run's interval
    * is empty.
    */
  private def q113(s: SparkSession, d: String): DataFrame = {
    val dimSide = history(s, d).select(
      col("user_id"), col("valid_from").as("ts"),
      (lit(Long.MinValue) + col("run_id")).as("event_id"),
      col("event_type").as("dim_type"))
    val evSide = Tables.events(s, d)
      .filter(col("ts") >= lit(cutoff).cast("timestamp"))
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(null).cast("string").as("dim_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    dimSide.unionAll(evSide)
      .withColumn("type_at", last(col("dim_type"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("event_id") >= 0)
      .select(col("user_id"), col("event_id"), col("ts"), col("type_at"))
  }

  /** Incremental aggregate maintenance (the IVM merge): a materialized
    * per-part rollup is brought current by combining it with the signed
    * aggregate of a CDC batch — inserts count +1, retractions (returned
    * lines) −1 — WITHOUT rescanning the base facts. Both sides reduce to
    * group-count-sized frames before they meet, groups whose live count
    * reaches zero vanish, and sum's associativity is the correctness
    * argument: merge(agg(base), agg(delta)) ≡ agg(base ∪ delta), which is
    * exactly what the oracle recomputes.
    */
  private def q115(s: SparkSession, d: String): DataFrame = {
    val ivmCut = "2000-06-01"
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity"), col("l_returnflag"), col("l_shipdate"))
    val baseAgg = li.filter(col("l_shipdate") < lit(ivmCut).cast("timestamp_ntz"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n_live"))
    val deltaAgg = li.filter(col("l_shipdate") >= lit(ivmCut).cast("timestamp_ntz"))
      .withColumn("sign", when(col("l_returnflag") === "R", -1L).otherwise(1L))
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity") * col("sign")).as("qty"), sum(col("sign")).as("n_live"))
    baseAgg.unionByName(deltaAgg)
      .groupBy(col("l_partkey"))
      .agg(sum(col("qty")).as("qty"), sum(col("n_live")).as("n_live"))
      .filter(col("n_live") > 0)
  }

  /** Top-3 orders by total price per priority class via the bounded
    * top-k aggregate — identical output to the window `row_number`
    * spelling (pinned in the spec and by the q112 oracle), without the
    * window's full per-partition sort.
    */
  private def q112(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.BoundedTopK
        .topKBy(col("o_orderkey"), col("o_totalprice"), 3).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(
        col("o_orderpriority"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.key").as("o_orderkey"),
        col("col.ord").as("o_totalprice"))
  }

  val defs: Map[String, Q] = Map(
    "q111_scd2_apply" -> q111,
    "q112_topk_agg" -> q112,
    "q113_pit_join" -> q113,
    "q115_ivm_merge" -> q115)

  val oracles: Map[String, String] = Map(
    "q111_scd2_apply" ->
      // CAST(ts AS TIMESTAMP) truncates ns → µs exactly like the Spark
      // loader's `div 1000`, so every comparison, window order and output
      // value below runs at the precision Spark sees
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events),
        |runs AS (
        |  SELECT *,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |              OR lag(event_type) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM ev WHERE ts < TIMESTAMP '2024-01-25'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |runid AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM runs),
        |hist AS (
        |  SELECT user_id, event_type, min(ts) AS valid_from,
        |    lead(min(ts)) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to
        |  FROM runid GROUP BY user_id, run_id, event_type),
        |cur AS (SELECT user_id, event_type, valid_from FROM hist
        |        WHERE valid_to IS NULL),
        |batch AS (
        |  SELECT user_id, event_type AS new_type, ts AS new_ts FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM ev WHERE ts >= TIMESTAMP '2024-01-25') WHERE rn = 1),
        |j AS (
        |  SELECT coalesce(c.user_id, b.user_id) AS user_id, c.event_type,
        |    c.valid_from, b.new_type, b.new_ts
        |  FROM cur c FULL OUTER JOIN batch b ON c.user_id = b.user_id)
        |SELECT user_id, event_type, valid_from, valid_to, FALSE AS is_current
        |FROM hist WHERE valid_to IS NOT NULL
        |UNION ALL
        |SELECT user_id, event_type, valid_from,
        |  CASE WHEN new_type IS NOT NULL AND new_type <> event_type
        |       THEN new_ts END AS valid_to,
        |  NOT (new_type IS NOT NULL AND new_type <> event_type) AS is_current
        |FROM j WHERE event_type IS NOT NULL
        |UNION ALL
        |SELECT user_id, new_type, new_ts, NULL, TRUE
        |FROM j WHERE new_type IS NOT NULL
        |  AND (event_type IS NULL OR new_type <> event_type)""".stripMargin,
    "q112_topk_agg" ->
      """SELECT o_orderpriority, rank, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank
        |  FROM orders)
        |WHERE rank <= 3""".stripMargin,
    "q113_pit_join" ->
      // the interval-join spelling of the same point-in-time semantics:
      // the version valid at the event's timestamp, half-open intervals
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events),
        |runs AS (
        |  SELECT *,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |              OR lag(event_type) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM ev WHERE ts < TIMESTAMP '2024-01-25'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |runid AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM runs),
        |hist AS (
        |  SELECT user_id, event_type, min(ts) AS valid_from,
        |    lead(min(ts)) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to
        |  FROM runid GROUP BY user_id, run_id, event_type)
        |SELECT e.user_id, e.event_id, e.ts, h.event_type AS type_at
        |FROM (SELECT user_id, event_id, ts FROM ev
        |      WHERE ts >= TIMESTAMP '2024-01-25') e
        |LEFT JOIN hist h ON h.user_id = e.user_id
        |  AND e.ts >= h.valid_from
        |  AND (h.valid_to IS NULL OR e.ts < h.valid_to)""".stripMargin,
    "q115_ivm_merge" ->
      // full signed recompute — equal to the incremental merge because
      // sum is associative over the base/delta split
      """SELECT * FROM (
        |  SELECT l_partkey,
        |    sum(CASE WHEN l_shipdate >= TIMESTAMP '2000-06-01'
        |               AND l_returnflag = 'R'
        |             THEN -l_quantity ELSE l_quantity END) AS qty,
        |    CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '2000-06-01'
        |               AND l_returnflag = 'R'
        |             THEN -1 ELSE 1 END) AS BIGINT) AS n_live
        |  FROM lineitem
        |  GROUP BY l_partkey)
        |WHERE n_live > 0""".stripMargin)
}
