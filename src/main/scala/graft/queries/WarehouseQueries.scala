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
  private def q111(s: SparkSession, d: String): DataFrame = {
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
    val hist = runs
      .groupBy(col("user_id"), col("run_id"), col("event_type"))
      .agg(min(col("ts")).as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("run_id"))))
    val closed = hist.filter(col("valid_to").isNotNull)
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"), lit(false).as("is_current"))
    val cur = hist.filter(col("valid_to").isNull)
      .select(col("user_id"), col("event_type"), col("valid_from"))
    val batch = ev.filter(col("ts") >= lit(cutoff).cast("timestamp"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("new_type"), col("ts").as("new_ts"))
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
    "q112_topk_agg" -> q112)

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
        |WHERE rank <= 3""".stripMargin)
}
