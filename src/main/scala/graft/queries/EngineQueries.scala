package graft.queries

import graft.Tables
import graft.operators.SkewJoin
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 engine-completeness set: the relational-surface operators a
  * user of a general analytics engine expects beyond the reference's own
  * workload — multidimensional aggregation (CUBE/GROUPING), the full
  * ranking-window family, semi-structured JSON access, regular
  * expressions, array/higher-order functions, sketch distinct counts,
  * UNPIVOT/melt, string functions (incl. edit distance), calendar math,
  * and the salted skew join (result-identical to the plain join — the
  * oracle proves it). All but the sketch query are DuckDB-oracle-checked;
  * the sketch query is oracle-checked through an error-bound predicate
  * the oracle asserts literally.
  */
object EngineQueries {
  private type Q = (SparkSession, String) => DataFrame

  private def r2(c: Column): Column = floor(c * 100 + lit(0.50001)) / 100
  // order-independent 2dp money aggregation — per-row exact cents, LONG
  // sum (see CoreQueries.sumR2 for the full scale rationale)
  private def sumR2(c: Column): Column =
    sum(floor(c * 100 + lit(0.50001)).cast("long")) / 100.0
  private def r6(c: Column): Column = floor(c * 1000000 + lit(0.50001)) / 1000000

  /** CUBE over two dimensions with GROUPING indicators — subsumes
    * ROLLUP (q39) and GROUPING SETS; the indicators disambiguate real
    * NULL keys from superaggregate rows.
    */
  private def q65(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_prio"),
        count(lit(1)).as("n"),
        sumR2(col("o_totalprice")).as("total"))

  /** Ranking-window family: ntile, percent_rank, cume_dist, lag, lead
    * over a deterministic (value, key) order. One shuffle on the
    * partition key; all five run in one window pass.
    */
  private def q66(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d).select(
      col("o_orderkey"),
      col("o_orderstatus"),
      ntile(4).over(w).as("quartile"),
      r6(percent_rank().over(w)).as("pr"),
      r6(cume_dist().over(w)).as("cd"),
      lag(col("o_orderkey"), 1).over(w).as("prev_key"),
      lead(col("o_orderkey"), 1).over(w).as("next_key"))
  }

  /** Semi-structured JSON access on `events.props`, by path
    * (get_json_object) and by schema (from_json → struct field) — the
    * oracle pins both to the same value.
    */
  private def q67(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      col("event_type"),
      get_json_object(col("props"), "$.k").cast("int").as("k"),
      from_json(col("props"), lit("k INT")).getField("k").as("k_typed"))

  /** Regular expressions: extract (group + leftmost-match), extract_all
    * count, replace with a character class. Patterns stay in the common
    * Java-regex/RE2 subset so engines agree.
    */
  private def q68(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      regexp_extract(col("source"), "([0-9]+)", 1).cast("int").as("src_num"),
      regexp_extract(col("text"), "([a-z]{6,})", 1).as("first_long"),
      expr("size(regexp_extract_all(text, 'b(atch|ig)', 0))").as("n_b"),
      regexp_replace(substring(col("text"), 1, 40), "[aeiou]", "*").as("masked"))

  /** Array / higher-order functions over the embedding column: sort,
    * element_at, HOF fold (aggregate), array_max + array_position —
    * all codegen'd built-ins, no UDF.
    */
  private def q69(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .select(
        col("vec_id"),
        r6(element_at(sort_array(col("v"), asc = false), 1)).as("top1"),
        r6(element_at(sort_array(col("v"), asc = false), 3)).as("top3"),
        r6(expr("aggregate(v, CAST(0 AS DOUBLE), (a, x) -> a + x)")).as("vsum"),
        array_position(col("v"), array_max(col("v"))).cast("int").as("argmax1"))

  /** Sketch distinct counts (HyperLogLog++), the 100 TB cardinality
    * path: one combinable pass, bounded memory. Cross-engine sketch
    * values differ by construction, so the oracle checks the EXACT
    * count plus a literal-true error-bound predicate — if the sketch
    * ever drifts past 10% relative error the hash compare fails.
    */
  private def q70(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        approx_count_distinct(col("user_id")).as("n_users_approx"))
      .select(
        col("event_type"),
        col("n_users"),
        (abs(col("n_users_approx") - col("n_users")).cast("double") /
          col("n_users") <= 0.1).as("within_bound"))

  /** UNPIVOT/melt: wide money columns → long (metric, value), then
    * re-aggregate. The Dataset.unpivot generator keeps this one pass.
    */
  private def q71(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .unpivot(
        Array(col("l_orderkey")),
        Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "metric", "val")
      .groupBy(col("metric"))
      .agg(sumR2(col("val")).as("total"))

  /** String-function surface: case mapping, padding, translate,
    * Levenshtein edit distance (the classic fuzzy-match primitive),
    * slicing + reverse.
    */
  private def q72(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey"),
      upper(col("c_name")).as("uname"),
      lpad(col("c_custkey").cast("string"), 8, "0").as("pad"),
      translate(col("c_mktsegment"), "AEIOU", "aeiou").as("tr"),
      levenshtein(col("c_name"), col("c_mktsegment")).as("lev"),
      reverse(substring(col("c_name"), 1, 5)).as("rev5"))

  /** Calendar math: month truncation, day arithmetic against an epoch,
    * ISO day-of-week, end-of-month — partition-column derivations every
    * date-partitioned lake layout needs.
    */
  private def q73(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      date_trunc("month", col("o_orderdate")).cast("date").as("mon"),
      datediff(to_date(col("o_orderdate")), lit("2024-01-01").cast("date"))
        .cast("int").as("days_since"),
      (weekday(col("o_orderdate")) + 1).cast("int").as("iso_dow"),
      last_day(to_date(col("o_orderdate"))).as("eom"))

  /** Salted skew join: the manual hot-key escape hatch must be
    * RESULT-identical to the plain equi-join — the oracle runs the
    * plain join, so any salting bug (dropped/duplicated rows) breaks
    * the hash compare.
    */
  private def q74(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .select(col("l_partkey").as("p_partkey"), col("l_quantity"))
    val small = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
    SkewJoin.saltedInnerJoin(big, small, "p_partkey", saltFactor = 8)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_lines"),
        sumR2(col("l_quantity")).as("sum_qty"))
  }

  /** Time-series gap-fill: dense per-status daily sales with
    * carry-forward — the resample/densify step before rolling features.
    */
  private def q75(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(
        col("o_orderstatus").as("st"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sumR2(col("o_totalprice")).as("total"))
    graft.operators.GapFill.forwardFillDaily(daily, "st", "day", "total")
  }

  /** PageRank (3 fixed iterations, damping 0.85) over the
    * supplier → part bipartite edge list; ranks are scaled to mean 1
    * (× node count) so 6-decimal rounding keeps full discrimination.
    */
  private def q76(s: SparkSession, d: String): DataFrame = {
    val edges = Tables.lineitem(s, d)
      .filter(col("l_suppkey").isNotNull && col("l_partkey").isNotNull)
      .select(
        col("l_suppkey").as("src"),
        (col("l_partkey") + 1000000L).as("dst"))
      .distinct()
    // The node count rides out of run() (computed there anyway for the
    // base-mass literal) — scaling is a per-row multiply by a literal, no
    // global window, no single-partition exchange over the |V|-sized frame.
    val (pr, n) = graft.operators.PageRank
      .runWithNodeCount(edges, damping = 0.85, iters = 3)
    pr.select(
      col("id"),
      r6(col("rank") * lit(n)).as("rank_scaled"))
  }

  /** Model-based quality filter, FROZEN-WEIGHT scoring: the logistic
    * hyperplane trained offline by
    * [[graft.model.QualityWeightsTrainer]] (md5-bucket bag-of-words +
    * Gopher stat features, weakly supervised by the rule outcome) is
    * applied as a pure expression pass — which makes the whole scoring
    * semantics hash-checkable against a DuckDB replay. Training itself
    * (iterative L-BFGS, not SQL-replayable) stays pinned by
    * `QualityModelSpec`'s accuracy floors — see
    * [[graft.operators.QualityModel.weaklySupervisedScore]] for the
    * in-query training path this query deliberately does not use.
    *
    * Squared stat terms let the linear model carve the rule's
    * between-bounds bands; squares are spelled `x*x` (not `pow`) so both
    * engines compute the identical product.
    */
  private def q77(s: SparkSession, d: String): DataFrame = {
    val labeled = graft.operators.QualityRules
      .gopherSignals(Tables.documents(s, d), "text")
      .select(
        col("doc_id"), col("text"),
        col("gopher_pass").cast("int").as("weak_label"),
        col("n_words").cast("double").as("f_nw"),
        (col("n_words") * col("n_words")).cast("double").as("f_nw2"),
        col("mean_word_len").as("f_mwl"),
        (col("mean_word_len") * col("mean_word_len")).as("f_mwl2"),
        col("stop_hits").cast("double").as("f_stop"))
    graft.operators.QualityModel
      .frozenScore(labeled, "doc_id", "text", "weak_label",
        statCols = Seq("f_nw", "f_nw2", "f_mwl", "f_mwl2", "f_stop"))
      .select(
        col("doc_id"), col("weak_label"), col("predicted"), col("p_good"))
  }

  /** Gaps-and-islands / SCD2 interval building: collapse each user's
    * consecutive same-type event runs into validity intervals
    * (valid_from, valid_to, is_current) — the dimension-history shape
    * every warehouse needs. One shuffle on the user key; the run flag,
    * run id, and interval bounds are all window passes over the same
    * partitioning.
    */
  private def q78(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wRun = Window.partitionBy(col("user_id"), col("run"))
    val wRuns = Window.partitionBy(col("user_id")).orderBy(col("run"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn(
        "chg",
        when(lag(col("event_type"), 1).over(wOrd).isNull ||
          lag(col("event_type"), 1).over(wOrd) =!= col("event_type"), 1)
          .otherwise(0))
      .withColumn("run", sum(col("chg")).over(wOrd))
      .groupBy(col("user_id"), col("run"))
      .agg(
        first(col("event_type")).as("event_type"),
        count(lit(1)).as("n_events"),
        min(unix_timestamp(col("ts"))).as("valid_from_s"))
      .withColumn("valid_to_s", lead(col("valid_from_s"), 1).over(wRuns))
      .withColumn("is_current", col("valid_to_s").isNull)
  }

  /** Ordered conversion funnel (signup → click → purchase): each later
    * stage's timestamp must follow the previous stage's. Stacked window
    * minima over ONE user partitioning — no per-stage self-joins, one
    * shuffle total.
    */
  private def q79(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, d)
      .select(
        col("user_id"),
        unix_timestamp(col("ts")).as("es"),
        col("event_type"))
      .withColumn("t1", min(when(col("event_type") === "signup", col("es"))).over(w))
      .withColumn(
        "t2",
        min(when(col("event_type") === "click" && col("es") > col("t1"), col("es"))).over(w))
      .withColumn(
        "t3",
        min(when(col("event_type") === "purchase" && col("es") > col("t2"), col("es"))).over(w))
      .select(col("user_id"), col("t1"), col("t2"), col("t3"))
      .distinct()
  }

  /** Cohort retention: users grouped by first-activity week, activity
    * counted by whole weeks since that first activity — the engagement
    * matrix behind every retention curve.
    */
  private def q80(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .withColumn("first_day", min(col("day")).over(w))
      .select(
        date_trunc("week", col("first_day")).cast("date").as("cohort_week"),
        floor(datediff(col("day"), col("first_day")) / 7).cast("int")
          .as("weeks_since"),
        col("user_id"))
      .groupBy(col("cohort_week"), col("weeks_since"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Heavy hitters per language via the Misra–Gries
    * `TypedImperativeAggregate`: per-group state is k entries regardless
    * of corpus size. The synthetic vocabulary (31 terms) is under the
    * capacity, so the sketch is in its EXACT regime and the oracle is a
    * plain GROUP BY count; the >k error bound is pinned by spec.
    */
  private def q81(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("lang"),
        explode(graft.operators.QualityRules.spaceTokens(col("text"))).as("term"))
      .groupBy(col("lang"))
      .agg(graft.functions.MisraGries.heavyHitters(col("term"), 256).as("hh"))
      .select(col("lang"), explode(col("hh")).as("e"))
      .select(col("lang"), col("e.term").as("term"), col("e.cnt").as("cnt"))

  val defs: Map[String, Q] = Map(
    "q81_heavy_hitters" -> q81,
    "q78_scd_islands" -> q78,
    "q79_funnel" -> q79,
    "q80_cohort" -> q80,
    "q75_gapfill" -> q75,
    "q76_pagerank" -> q76,
    "q77_quality_model" -> q77,
    "q65_cube_grouping" -> q65,
    "q66_window_suite" -> q66,
    "q67_json_extract" -> q67,
    "q68_regex_extract" -> q68,
    "q69_array_ops" -> q69,
    "q70_approx_distinct" -> q70,
    "q71_unpivot" -> q71,
    "q72_string_suite" -> q72,
    "q73_date_math" -> q73,
    "q74_salted_join" -> q74)

  /** q77's oracle replays the frozen-weight scoring bit-for-bit: same
    * tokenization as q51's, the 256-weight array inlined as a list
    * literal (interpolated from [[graft.model.QualityWeights]], so
    * fixture and oracle can never drift), token weights summed
    * left-to-right in document order on both engines, margin rounded at
    * 1e-6 BEFORE the sigmoid, class = sign of rounded margin.
    */
  private def q77OracleSql: String = {
    import graft.model.QualityWeights.{intercept, statW, textW}
    val tw = textW.mkString("[", ", ", "]")
    val Array(wNw, wNw2, wMwl, wMwl2, wStop) = statW
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(string_split(coalesce(text, ''), ' '), x -> len(x) > 0) AS tk,
       |    length(regexp_replace(coalesce(text, ''), '[ \\t\\n\\f\\r]', '', 'g')) AS n_nonspace
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, tk, len(tk) AS n_words,
       |    CASE WHEN len(tk) = 0 THEN 0.0
       |         ELSE CAST(n_nonspace AS DOUBLE) / len(tk) END AS mwl,
       |    len(list_intersect(list_distinct(tk),
       |        ['the', 'a', 'and', 'of', 'to'])) AS stop_hits
       |  FROM t),
       |sc AS (
       |  SELECT doc_id, n_words, mwl, stop_hits,
       |    coalesce(list_sum(list_transform(tk, x ->
       |      ($tw)[(CAST(CONCAT('0x', substring(md5(x), 1, 4)) AS BIGINT) % 256) + 1])),
       |      0.0) AS tscore
       |  FROM s),
       |m AS (
       |  SELECT doc_id,
       |    CASE WHEN n_words BETWEEN 20 AND 90
       |          AND mwl BETWEEN 3.0 AND 4.6 AND stop_hits >= 1
       |         THEN 1 ELSE 0 END AS weak_label,
       |    floor(((tscore +
       |      (((((CAST(n_words AS DOUBLE) * ($wNw)) +
       |          (CAST(n_words * n_words AS DOUBLE) * ($wNw2))) +
       |          (mwl * ($wMwl))) +
       |          ((mwl * mwl) * ($wMwl2))) +
       |          (CAST(stop_hits AS DOUBLE) * ($wStop)))) +
       |      ($intercept)) * 1000000 + 0.50001) / 1000000 AS mr
       |  FROM sc)
       |SELECT doc_id, weak_label,
       |  CASE WHEN mr >= 0 THEN 1 ELSE 0 END AS predicted,
       |  floor((1.0 / (1.0 + exp(-mr))) * 1000000 + 0.50001) / 1000000 AS p_good
       |FROM m""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q77_quality_model" -> q77OracleSql,
    "q81_heavy_hitters" ->
      """SELECT lang, tok AS term, count(*) AS cnt FROM (
        |  SELECT lang,
        |    unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS tok
        |  FROM documents)
        |GROUP BY 1, 2""".stripMargin,
    "q78_scd_islands" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (
        |  SELECT user_id, ts, event_type,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM o),
        |g AS (
        |  SELECT user_id, run, any_value(event_type) AS event_type,
        |    count(*) AS n_events,
        |    min(CAST(floor(epoch(ts)) AS BIGINT)) AS valid_from_s
        |  FROM r GROUP BY user_id, run)
        |SELECT user_id, CAST(run AS BIGINT) AS run, event_type, n_events, valid_from_s,
        |  lead(valid_from_s) OVER (PARTITION BY user_id ORDER BY run) AS valid_to_s,
        |  (lead(valid_from_s) OVER (PARTITION BY user_id ORDER BY run) IS NULL)
        |    AS is_current
        |FROM g""".stripMargin,
    "q79_funnel" ->
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, event_type
        |  FROM events),
        |s1 AS (
        |  SELECT *, min(CASE WHEN event_type = 'signup' THEN es END)
        |    OVER (PARTITION BY user_id) AS t1 FROM e),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND es > t1 THEN es END)
        |    OVER (PARTITION BY user_id) AS t2 FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND es > t2 THEN es END)
        |    OVER (PARTITION BY user_id) AS t3 FROM s2)
        |SELECT DISTINCT user_id, t1, t2, t3 FROM s3""".stripMargin,
    "q80_cohort" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (
        |  SELECT user_id, day,
        |    min(day) OVER (PARTITION BY user_id) AS first_day FROM e)
        |SELECT CAST(date_trunc('week', first_day) AS DATE) AS cohort_week,
        |  CAST(floor(datediff('day', first_day, day) / 7) AS INT) AS weeks_since,
        |  count(DISTINCT user_id) AS n_users
        |FROM f GROUP BY 1, 2""".stripMargin,
    "q75_gapfill" ->
      """WITH daily AS (
        |  SELECT o_orderstatus AS st, CAST(o_orderdate AS DATE) AS day,
        |    sum(CAST(floor(o_totalprice * 100 + 0.50001) AS BIGINT)) / 100.0 AS total
        |  FROM orders GROUP BY 1, 2),
        |cal AS (
        |  SELECT st, CAST(unnest(generate_series(min(day), max(day),
        |    INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM daily GROUP BY st),
        |j AS (SELECT c.st, c.day, d.total FROM cal c
        |      LEFT JOIN daily d ON d.st = c.st AND d.day = c.day)
        |SELECT st, day,
        |  last_value(total IGNORE NULLS) OVER (PARTITION BY st ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total_filled,
        |  (total IS NULL) AS is_gap
        |FROM j""".stripMargin,
    "q76_pagerank" ->
      """WITH e AS (
        |  SELECT DISTINCT l_suppkey AS src, 1000000 + l_partkey AS dst
        |  FROM lineitem
        |  WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL),
        |nodes AS (SELECT DISTINCT id FROM
        |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |deg AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
        |n AS (SELECT count(*) AS cnt FROM nodes),
        |pr0 AS (SELECT id, 1.0 / n.cnt AS rank FROM nodes CROSS JOIN n),
        |pr1 AS (
        |  SELECT v.id, 0.15 / any_value(n.cnt) +
        |    0.85 * COALESCE(sum(p.rank / d.outd), 0) AS rank
        |  FROM nodes v CROSS JOIN n
        |  LEFT JOIN e ON e.dst = v.id
        |  LEFT JOIN pr0 p ON p.id = e.src
        |  LEFT JOIN deg d ON d.src = e.src
        |  GROUP BY v.id),
        |pr2 AS (
        |  SELECT v.id, 0.15 / any_value(n.cnt) +
        |    0.85 * COALESCE(sum(p.rank / d.outd), 0) AS rank
        |  FROM nodes v CROSS JOIN n
        |  LEFT JOIN e ON e.dst = v.id
        |  LEFT JOIN pr1 p ON p.id = e.src
        |  LEFT JOIN deg d ON d.src = e.src
        |  GROUP BY v.id),
        |pr3 AS (
        |  SELECT v.id, 0.15 / any_value(n.cnt) +
        |    0.85 * COALESCE(sum(p.rank / d.outd), 0) AS rank
        |  FROM nodes v CROSS JOIN n
        |  LEFT JOIN e ON e.dst = v.id
        |  LEFT JOIN pr2 p ON p.id = e.src
        |  LEFT JOIN deg d ON d.src = e.src
        |  GROUP BY v.id)
        |SELECT p.id,
        |  floor(p.rank * n.cnt * 1000000 + 0.50001) / 1000000 AS rank_scaled
        |FROM pr3 p CROSS JOIN n""".stripMargin,
    "q65_cube_grouping" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        |  count(*) AS n,
        |  sum(CAST(floor(o_totalprice * 100 + 0.50001) AS BIGINT)) / 100.0 AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q66_window_suite" ->
      """SELECT o_orderkey, o_orderstatus,
        |  ntile(4) OVER w AS quartile,
        |  floor(percent_rank() OVER w * 1000000 + 0.50001) / 1000000 AS pr,
        |  floor(cume_dist() OVER w * 1000000 + 0.50001) / 1000000 AS cd,
        |  lag(o_orderkey, 1) OVER w AS prev_key,
        |  lead(o_orderkey, 1) OVER w AS next_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin,
    "q67_json_extract" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_typed
        |FROM events""".stripMargin,
    "q68_regex_extract" ->
      """SELECT doc_id,
        |  CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) AS src_num,
        |  regexp_extract(text, '([a-z]{6,})', 1) AS first_long,
        |  CAST(len(regexp_extract_all(text, 'b(atch|ig)')) AS INT) AS n_b,
        |  regexp_replace(substr(text, 1, 40), '[aeiou]', '*', 'g') AS masked
        |FROM documents""".stripMargin,
    "q69_array_ops" ->
      """WITH t AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings)
        |SELECT vec_id,
        |  floor(list_sort(v, 'DESC')[1] * 1000000 + 0.50001) / 1000000 AS top1,
        |  floor(list_sort(v, 'DESC')[3] * 1000000 + 0.50001) / 1000000 AS top3,
        |  floor(list_aggregate(v, 'sum') * 1000000 + 0.50001) / 1000000 AS vsum,
        |  CAST(list_position(v, list_max(v)) AS INT) AS argmax1
        |FROM t""".stripMargin,
    "q70_approx_distinct" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_users,
        |  TRUE AS within_bound
        |FROM events GROUP BY event_type""".stripMargin,
    "q71_unpivot" ->
      """SELECT metric, sum(CAST(floor(val * 100 + 0.50001) AS BIGINT)) / 100.0 AS total
        |FROM (
        |  SELECT 'l_extendedprice' AS metric, l_extendedprice AS val FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |GROUP BY metric""".stripMargin,
    "q72_string_suite" ->
      """SELECT c_custkey,
        |  upper(c_name) AS uname,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS pad,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr,
        |  CAST(levenshtein(c_name, c_mktsegment) AS INT) AS lev,
        |  reverse(left(c_name, 5)) AS rev5
        |FROM customer""".stripMargin,
    "q73_date_math" ->
      """SELECT o_orderkey,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
        |  CAST(datediff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS INT)
        |    AS days_since,
        |  CAST(isodow(o_orderdate) AS INT) AS iso_dow,
        |  last_day(CAST(o_orderdate AS DATE)) AS eom
        |FROM orders""".stripMargin,
    "q74_salted_join" ->
      """SELECT p_brand, count(*) AS n_lines,
        |  sum(CAST(floor(l_quantity * 100 + 0.50001) AS BIGINT)) / 100.0 AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin)
}
