package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming uplift (SURVEY.md §7.4.6): the reference is batch
  * only (its "incremental" flavor is an Airflow DAG scheduling one day per
  * run); here the same transforms run identically over a batch DataFrame
  * or a stream, and the stateful pieces use the streaming state store.
  *
  * Scale design: windowed aggregation state is bounded by the watermark;
  * session state by the per-key struct (two longs). Both shuffle once on
  * the grouping key, exactly like their batch counterparts.
  */
object EventStreams {

  /** Hourly event rollup — works on a batch OR streaming events frame
    * (same code path; Spark plans it as a streaming agg when the source
    * streams). Watermark bounds state for late data.
    */
  def hourlyRollup(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    src
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("hour_start"),
        col("event_type"),
        col("n_events"),
        col("total_value"))
  }

  /** Batch sessionization: a session break is a ≥`gapSeconds` silence per
    * user (lag window). Returns per-user session counts.
    */
  def sessionCounts(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"))
    events
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn(
        "__new_session",
        when(
          col("__prev").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("__prev")) >= gapSeconds,
          1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(
        sum(col("__new_session")).as("n_sessions"),
        count(lit(1)).as("n_events"))
  }

  final case class SessionState(lastTsMicros: Long, sessions: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Streaming sessionization via `flatMapGroupsWithState`, keyed by
    * user — the same greedy fold as [[sessionCounts]] but with state in
    * the state store (remaining analogue of SURVEY §2.8's allocation
    * state). Emits a running per-user session count each trigger.
    *
    * State is BOUNDED: a watermark (`watermarkDelay`) plus an event-time
    * timeout evict a user's state once it has been idle past the
    * watermark for `stateIdleTimeoutSec`. An evicted user who returns
    * restarts counting from zero — the standard bounded-state trade-off;
    * size `stateIdleTimeoutSec` ≫ `gapSeconds` so any evicted session
    * would have been closed anyway. Out-of-order *within* a micro-batch
    * is handled by sorting the key's batch slice (memory is bounded by
    * one key's events in one trigger, not all history); an event arriving
    * *behind* the state's high-water mark (late across triggers, inside
    * the watermark) is counted but never regresses the session clock.
    */
  def sessionCountsStreaming(
      events: DataFrame,
      gapSeconds: Long = 1800L,
      watermarkDelay: String = "2 hours",
      stateIdleTimeoutSec: Long = 24L * 3600): DataFrame = {
    import events.sparkSession.implicits._
    val isStreamingSrc = events.isStreaming // hoisted: the closure must not capture the DataFrame
    // The watermark must be on a column that SURVIVES into the stateful
    // operator's child (its eventTime tag rides the attribute; projecting
    // the column away fails the unsupported-operation check) — so keep
    // `ts` itself and convert to micros inside the fold.
    val src = events.selectExpr("user_id", "ts")
    val wm = if (isStreamingSrc) src.withWatermark("ts", watermarkDelay) else src
    wm
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle past watermark + horizon: evict (count restarts if the
            // user ever returns; any open session is long closed by now)
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
            var n = 0L
            // floor to seconds × 1e6: same granularity as batch unix_timestamp()
            rows.map(r => r._2.getTime / 1000L * 1000000L).toSeq.sorted.foreach { ts =>
              if (ts < st.lastTsMicros) {
                n += 1 // late event inside an already-seen span: count it,
                       // keep the session clock monotonic
              } else {
                val isNew = st.lastTsMicros == Long.MinValue ||
                  ts - st.lastTsMicros >= gapSeconds * 1000000L
                st = SessionState(ts, st.sessions + (if (isNew) 1L else 0L))
                n += 1
              }
            }
            state.update(st)
            if (isStreamingSrc && st.lastTsMicros != Long.MinValue)
              state.setTimeoutTimestamp(
                st.lastTsMicros / 1000L + stateIdleTimeoutSec * 1000L)
            Iterator(UserSessions(userId, st.sessions, n))
          }
      }
      .toDF()
  }

  /** Exactly-once event dedup by id — the ingestion guard every event
    * pipeline needs against at-least-once upstream delivery. On a stream
    * this uses `dropDuplicatesWithinWatermark`: state holds only ids seen
    * within the watermark horizon (bounded), so a duplicate arriving
    * within `watermarkDelay` of the original is dropped and state is
    * evicted once the watermark passes it. On a batch frame the same call
    * degrades to a plain `dropDuplicates` over the id (global, exact).
    * One shuffle on the id either way.
    */
  def dedupEvents(
      events: DataFrame,
      idCols: Seq[String] = Seq("event_id"),
      watermarkDelay: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark(idCols)
    else
      events.dropDuplicates(idCols)

  /** Sessionization via the BUILT-IN `session_window` (dynamic-gap
    * session windows, state-store-native on streams): per-user sessions
    * close after `gap` of silence, one row per (user, session) with its
    * bounds and event count. Equivalent to the lag-window formulation
    * [[sessionCounts]] for counting purposes — the parity test in
    * `EventStreamsSpec` pins Σ sessions and Σ events per user equal
    * across the two. `watermarkDelay` is the LATENESS tolerance and is a
    * separate knob from the session gap (conflating them would silently
    * drop events later than one gap).
    */
  def sessionWindows(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    src
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("__w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("__w.start").as("session_start"),
        col("__w.end").as("session_end"),
        col("n_events"))
  }

  /** Stream-stream interval join — purchase↔click attribution: every
    * (purchase, click) pair of the same user with the click inside the
    * `lookback` window strictly before the purchase (q49's batch shape).
    *
    * On streaming inputs BOTH sides carry watermarks and the event-time
    * range condition is what lets Spark BOUND the join state: a buffered
    * click is evicted once the watermark passes `cts + lookback` (no
    * purchase can match it anymore), so state is O(events in the
    * lookback+watermark horizon), not O(history). Inner join ⇒ Append
    * mode. On batch frames the identical expression plans as an ordinary
    * range join — one code path, two execution regimes.
    */
  def attributedClicks(
      purchases: DataFrame,
      clicks: DataFrame,
      lookback: String = "30 minutes",
      watermarkDelay: String = "2 hours"): DataFrame = {
    // rename BEFORE the watermark so each side's event-time column is
    // unambiguous in the join condition (and no self-join resolution
    // magic is needed when both sides derive from one source)
    val p0 = purchases.select(
      col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val c0 = clicks.select(
      col("event_id").as("click_id"),
      col("user_id").as("click_user"),
      col("ts").as("cts"))
    val p = if (purchases.isStreaming) p0.withWatermark("pts", watermarkDelay) else p0
    val c = if (clicks.isStreaming) c0.withWatermark("cts", watermarkDelay) else c0
    p.join(
        c,
        col("user_id") === col("click_user") &&
          col("cts") >= col("pts") - expr(s"INTERVAL $lookback") &&
          col("cts") < col("pts"))
      .select(
        col("purchase_id"), col("user_id"), col("pts"),
        col("click_id"), col("cts"))
  }

  /** Run a transform over a parquet path as a file stream with
    * `Trigger.AvailableNow`, writing to an in-memory table; returns the
    * result. Used to prove batch/stream parity in tests.
    */
  def runAvailableNow(
      spark: SparkSession,
      sourcePath: String,
      schema: StructType,
      transform: DataFrame => DataFrame,
      queryName: String,
      mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val stream = spark.readStream.schema(schema).parquet(sourcePath)
    val q = transform(stream).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** [[runAvailableNow]] in Update mode (for stateful operators like
    * `flatMapGroupsWithState` that cannot run under Complete).
    */
  def runAvailableNowUpdate(
      spark: SparkSession,
      sourcePath: String,
      schema: StructType,
      transform: DataFrame => DataFrame,
      queryName: String): DataFrame =
    runAvailableNow(spark, sourcePath, schema, transform, queryName, OutputMode.Update())
}
