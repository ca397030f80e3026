package graft.streaming

import graft.{SparkTestBase, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** Batch/stream parity: the same transforms must produce identical
  * results when run over the events table as a batch frame and as a
  * file stream with Trigger.AvailableNow.
  */
class EventStreamsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** The file stream source wants a DIRECTORY; stage the single events
    * parquet into one.
    */
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      d.resolve("events.parquet"))
    d.toFile.deleteOnExit()
    d.toString
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().toIndexedSeq
      .map(_.toSeq.map(String.valueOf(_)).mkString("|")).sorted

  test("hourlyRollup: streaming (AvailableNow) == batch") {
    val batchEvents = Tables.events(spark, sf)
    val batch = EventStreams.hourlyRollup(batchEvents)
    // File-stream the same parquet; nanos ts needs the same legacy conf +
    // conversion the batch loader applies.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$sf/events.parquet").schema
    val streamed = EventStreams.runAvailableNow(
      spark,
      streamDir,
      rawSchema,
      df => EventStreams.hourlyRollup(Tables.normalizeEventsTs(df)),
      "hourly_test")
    assert(canon(streamed) == canon(batch))
    assert(batch.count() > 0)
  }

  test("sessionCountsStreaming (flatMapGroupsWithState) == batch sessionCounts") {
    val events = Tables.events(spark, sf)
    val batch = canon(EventStreams.sessionCounts(events))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$sf/events.parquet").schema
    val streamed = EventStreams.runAvailableNowUpdate(
      spark,
      streamDir,
      rawSchema,
      df => EventStreams.sessionCountsStreaming(Tables.normalizeEventsTs(df)),
      "sessions_test")
    assert(canon(streamed) == batch)
  }

  test("dedupEvents: at-least-once delivery collapses to exactly-once") {
    import org.apache.spark.sql.functions._
    // stage the events parquet TWICE — the stream delivers every event
    // at least twice, the dedup must collapse them back
    val dupDir = java.nio.file.Files.createTempDirectory("events_dup")
    for (n <- Seq("a.parquet", "b.parquet"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/events.parquet"), dupDir.resolve(n))
    dupDir.toFile.deleteOnExit()
    val distinctIds = Tables.events(spark, sf).select("event_id").distinct().count()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$sf/events.parquet").schema
    val streamed = EventStreams.runAvailableNow(
      spark,
      dupDir.toString,
      rawSchema,
      df => EventStreams.dedupEvents(Tables.normalizeEventsTs(df))
        .select("event_id"),
      "dedup_test",
      org.apache.spark.sql.streaming.OutputMode.Append())
    assert(streamed.count() == distinctIds)
    assert(streamed.distinct().count() == distinctIds) // no id twice
    // batch path: same call degrades to a global exact dropDuplicates
    val doubled = Tables.events(spark, sf).union(Tables.events(spark, sf))
    assert(EventStreams.dedupEvents(doubled).count() == distinctIds)
  }

  test("session_window == lag-window sessionization on counts per user") {
    // caveat: sessionCounts floors timestamps to seconds (unix_timestamp)
    // while session_window compares exact micros — a pair straddling the
    // gap boundary by sub-second amounts could split differently; the
    // synthetic events carry no such adversarial pair, and the parity
    // here is the behavioural contract the two formulations share
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, sf)
    val viaLag = EventStreams.sessionCounts(events, gapSeconds = 1800L)
      .select("user_id", "n_sessions", "n_events")
      .as[(Long, Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val viaWindow = EventStreams.sessionWindows(events, "30 minutes")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .as[(Long, Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(viaWindow.nonEmpty)
    assert(viaWindow == viaLag)
  }

  test("checkpointed restart: only new files process, file sink stays exactly-once") {
    import org.apache.spark.sql.functions._
    val srcDir = java.nio.file.Files.createTempDirectory("events_restart_src")
    val outDir = java.nio.file.Files.createTempDirectory("events_restart_out")
    val ckDir = java.nio.file.Files.createTempDirectory("events_restart_ck")
    Seq(srcDir, outDir, ckDir).foreach(_.toFile.deleteOnExit())
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$sf/events.parquet").schema

    def runOnce(): Unit = {
      val q = Tables.normalizeEventsTs(
          spark.readStream.schema(rawSchema).parquet(srcDir.toString))
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
        .writeStream
        .format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckDir.toString)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    val perFile = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), srcDir.resolve("a.parquet"))
    runOnce()
    assert(spark.read.parquet(outDir.toString).count() == perFile)
    // restart with one NEW file: the checkpoint must skip file a entirely
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), srcDir.resolve("b.parquet"))
    runOnce()
    val out = spark.read.parquet(outDir.toString)
    assert(out.count() == 2 * perFile) // a once + b once, never a twice
    // every event id appears exactly twice (once per source file)
    val badCounts = out.groupBy("event_id").count()
      .filter(col("count") =!= 2).count()
    assert(badCounts == 0)
  }

  test("attributedClicks: stream-stream interval join == batch range join") {
    import org.apache.spark.sql.functions._
    val batchEvents = Tables.events(spark, sf)
    val batch = canon(EventStreams.attributedClicks(
      batchEvents.filter(col("event_type") === "purchase"),
      batchEvents.filter(col("event_type") === "click")))
    assert(batch.nonEmpty)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$sf/events.parquet").schema
    // two independent file streams over the same staged directory — the
    // exact `div`-based nanos→micros conversion the batch loader applies
    def side(tpe: String) = Tables.normalizeEventsTs(
        spark.readStream.schema(rawSchema).parquet(streamDir))
      .filter(col("event_type") === tpe)
    val q = EventStreams.attributedClicks(side("purchase"), side("click"))
      .writeStream
      .format("memory")
      .queryName("attrib_test")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(canon(spark.table("attrib_test")) == batch)
  }
}
