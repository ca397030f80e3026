package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-objective, journey, and mixture analytics: the Pareto frontier
  * (skyline), the first-order Markov transition matrix over user event
  * streams, and per-source distribution-drift (KL) monitoring.
  *
  * Scale shapes: q117 never runs the O(N²) dominance join — the frontier
  * of (maximize, maximize) is computable from per-x-value maxima with
  * one running-max pass, so the quadratic test collapses to a
  * DISTINCT-X-sized sort (the oracle keeps the NOT EXISTS spelling as
  * the independent semantic definition). q118 is one window pass keyed
  * by user plus a vocabulary²-bounded aggregation — the transition
  * matrix is event-type² rows regardless of corpus size.
  */
object AnalyticsQueries {
  private type Q = (SparkSession, String) => DataFrame

  private def r6(c: Column): Column = floor(c * 1000000 + lit(0.50001)) / 1000000

  /** 2-D skyline: orders not dominated in (o_totalprice, o_orderdate),
    * both maximized — "no other order is at least as expensive AND at
    * least as recent, and strictly better in one". Per-date maxima
    * first (date-count-sized), then a running max over strictly later
    * dates decides survival; survivors re-attach every order at their
    * (date, price) point, so ties on both axes all surface. The global
    * window runs over DISTINCT DATES, not rows — at 100 TB that frame is
    * calendar-sized; a fully general skyline would range-partition by x
    * and exchange per-partition maxima, the same two-phase shape.
    */
  private def q117(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
      .withColumn("negday",
        -unix_micros(col("o_orderdate").cast("timestamp")))
    val perDate = o.groupBy(col("negday")).agg(max(col("o_totalprice")).as("best"))
    val later = Window.orderBy(col("negday"))
      .rangeBetween(Window.unboundedPreceding, -1) // strictly later dates
    val frontier = perDate
      .withColumn("max_later", max(col("best")).over(later))
      .filter(col("max_later").isNull || col("best") > col("max_later"))
      .select(col("negday"), col("best"))
    o.join(frontier,
        o("negday") === frontier("negday") && col("o_totalprice") === col("best"))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
  }

  /** First-order Markov transition matrix between event types: per-user
    * consecutive event pairs (ordered by ts, then event_id) counted and
    * normalized into row-stochastic probabilities. Probabilities are
    * rounded before output (the q42/q101 discipline) and the count/total
    * division is exact small-integer arithmetic in doubles — bit-stable
    * across engines.
    */
  private def q118(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    pairs
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("prob", r6(col("n_trans").cast("double") /
        sum(col("n_trans")).over(Window.partitionBy(col("from_type")))))
  }

  /** Data-mixture drift: per-source KL divergence between the source's
    * doc-length distribution (log2 buckets) and the corpus-wide one —
    * the monitoring query a training pipeline runs to catch a source
    * whose composition shifted. One map-combinable shuffle builds the
    * (source, bucket) counts; every marginal (per-source totals, per-
    * bucket corpus counts, grand total) derives from that frame with
    * window passes, so the corpus is scanned ONCE and nothing after the
    * first aggregation exceeds |sources| × |buckets| rows (~40 buckets
    * ever; KL terms only over buckets the source occupies, so p > 0 and
    * q > 0 by construction).
    */
  private def q120(s: SparkSession, d: String): DataFrame = {
    val sb = Tables.documents(s, d)
      // greatest(n_chars, 1): Spark's log2(0) is NULL but DuckDB's is
      // -inf (whose BIGINT cast errors) — clamping on BOTH sides keeps an
      // empty document in a well-defined bucket 0 instead of diverging
      .select(col("source"),
        floor(log2(greatest(col("n_chars"), lit(1)))).cast("long").as("bucket"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_sb"))
    val bySource = Window.partitionBy(col("source"))
    val byBucket = Window.partitionBy(col("bucket"))
    val all = Window.partitionBy()
    sb
      .withColumn("n_s", sum(col("n_sb")).over(bySource))
      .withColumn("n_b", sum(col("n_sb")).over(byBucket))
      .withColumn("n", sum(col("n_sb")).over(all))
      .withColumn("term",
        (col("n_sb") / col("n_s")) *
          log((col("n_sb") / col("n_s")) / (col("n_b") / col("n"))))
      .groupBy(col("source"))
      .agg(
        max(col("n_s")).as("n_docs"),
        r6(sum(col("term"))).as("kl"))
  }

  /** Per-key linear trend fitting — thousands of micro-forecasts in one
    * pass: daily event counts per type, then OLS slope/intercept/R² per
    * key via the built-in `regr_*` aggregates. The shape a fleet-wide
    * metrics pipeline needs: NO per-key fit loop, no collect — both
    * levels are map-side-combinable aggregations (the regr moments are
    * sums), so 10⁶ keys cost the same two shuffles as 5. The daily
    * rollup frame is keys × days — bounded and tiny relative to raw
    * events at every scale.
    */
  private def q121(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        datediff(col("day"), lit("2024-01-01").cast("date")).cast("double").as("x"),
        col("n").cast("double").as("y"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        r6(expr("regr_slope(y, x)")).as("slope"),
        r6(expr("regr_intercept(y, x)")).as("intercept"),
        r6(expr("regr_r2(y, x)")).as("r2"))

  /** Conversion attribution (first/last touch): every view/click is
    * attributed to the user's NEXT purchase — the path resets at each
    * conversion, the standard multi-touch model. No range join and no
    * per-purchase scan: one window pass assigns every event its path id
    * (= running count of strictly-earlier purchases for that user),
    * touches then collapse to one row per (user, path) via combinable
    * min_by/max_by/count, and a single equi-join attaches them to the
    * path's closing purchase. Purchases with no touches in their path
    * drop out (inner join).
    */
  private def q122(s: SparkSession, d: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("path_id", coalesce(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(ord),
        lit(0L)))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .groupBy(col("user_id"), col("path_id"))
      .agg(
        min_by(struct(col("event_type"), col("ts")),
          struct(col("ts"), col("event_id"))).as("first"),
        max_by(struct(col("event_type"), col("ts")),
          struct(col("ts"), col("event_id"))).as("last"),
        count(lit(1)).as("n_touches"))
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("path_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .join(touches, Seq("user_id", "path_id"))
      .select(
        col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("first.event_type").as("first_touch_type"),
        col("first.ts").as("first_touch_ts"),
        col("last.event_type").as("last_touch_type"),
        col("last.ts").as("last_touch_ts"),
        col("n_touches"))
  }

  val defs: Map[String, Q] = Map(
    "q117_skyline" -> q117,
    "q118_transitions" -> q118,
    "q120_source_kl" -> q120,
    "q121_trend_fit" -> q121,
    "q122_attribution" -> q122)

  val oracles: Map[String, String] = Map(
    "q117_skyline" ->
      // independent O(n log n) spelling of the same 2-D dominance
      // semantics (the r10 NOT EXISTS version replayed quadratically —
      // >600 s on 1.5M orders at sf1). A row survives iff (a) its price
      // is the max of its date (else the same-date max dominates it)
      // and (b) that per-date max strictly exceeds every max on a
      // later date (a later row with >= price dominates: date strict).
      // Equal (price, date) duplicates dominate in neither direction
      // and all survive — the join keeps every tying row.
      """WITH dm AS (
        |  SELECT o_orderdate AS d, max(o_totalprice) AS mp
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT d, mp,
        |    max(mp) OVER (ORDER BY d DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ml
        |  FROM dm)
        |SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
        |FROM orders o
        |JOIN w ON o.o_orderdate = w.d AND o.o_totalprice = w.mp
        |WHERE w.ml IS NULL OR w.mp > w.ml""".stripMargin,
    "q122_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS path_id
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |t AS (
        |  -- DuckDB's min_by/max_by take no struct ordering key: encode
        |  -- (ts, event_id) as a zero-padded sortable string instead
        |  SELECT user_id, path_id,
        |    min_by(event_type,
        |      printf('%020d:%012d', epoch_us(ts), event_id))
        |      AS first_touch_type,
        |    min(ts) AS first_touch_ts,
        |    max_by(event_type,
        |      printf('%020d:%012d', epoch_us(ts), event_id))
        |      AS last_touch_type,
        |    max(ts) AS last_touch_ts,
        |    CAST(count(*) AS BIGINT) AS n_touches
        |  FROM ev WHERE event_type <> 'purchase'
        |  GROUP BY 1, 2)
        |SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
        |  t.first_touch_type, t.first_touch_ts,
        |  t.last_touch_type, t.last_touch_ts, t.n_touches
        |FROM ev p
        |JOIN t ON p.user_id = t.user_id AND p.path_id = t.path_id
        |WHERE p.event_type = 'purchase'""".stripMargin,
    "q121_trend_fit" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS DOUBLE) AS y
        |  FROM events GROUP BY 1, 2),
        |xy AS (
        |  SELECT event_type,
        |    CAST(day - DATE '2024-01-01' AS DOUBLE) AS x, y
        |  FROM daily)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  floor(regr_slope(y, x) * 1000000 + 0.50001) / 1000000 AS slope,
        |  floor(regr_intercept(y, x) * 1000000 + 0.50001) / 1000000
        |    AS intercept,
        |  floor(regr_r2(y, x) * 1000000 + 0.50001) / 1000000 AS r2
        |FROM xy GROUP BY event_type""".stripMargin,
    "q120_source_kl" ->
      """WITH sb AS (
        |  SELECT source, CAST(floor(log2(greatest(n_chars, 1))) AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_sb
        |  FROM documents GROUP BY 1, 2),
        |m AS (
        |  SELECT source, bucket, n_sb,
        |    sum(n_sb) OVER (PARTITION BY source) AS n_s,
        |    sum(n_sb) OVER (PARTITION BY bucket) AS n_b,
        |    sum(n_sb) OVER () AS n
        |  FROM sb)
        |SELECT source, CAST(max(n_s) AS BIGINT) AS n_docs,
        |  floor(sum((CAST(n_sb AS DOUBLE)/n_s) *
        |    ln((CAST(n_sb AS DOUBLE)/n_s) / (CAST(n_b AS DOUBLE)/n)))
        |    * 1000000 + 0.50001) / 1000000 AS kl
        |FROM m GROUP BY source""".stripMargin,
    "q118_transitions" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events),
        |p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM ev),
        |c AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_trans
        |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n_trans,
        |  floor((CAST(n_trans AS DOUBLE)
        |    / sum(n_trans) OVER (PARTITION BY from_type)) * 1000000
        |    + 0.50001) / 1000000 AS prob
        |FROM c""".stripMargin)
}
