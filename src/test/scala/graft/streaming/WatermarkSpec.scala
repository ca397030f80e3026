package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

/** Watermark semantics — asserting what Spark GUARANTEES, observed
  * empirically on 4.1.2:
  *
  *  - the watermark advances per micro-batch to (max event time − delay);
  *  - Append mode emits a window only after the watermark passes its end
  *    (no speculative emission of open windows);
  *  - state is evicted at the watermark (bounded state).
  *
  * NOTE deliberately NOT asserted: that a too-late row is dropped.
  * Spark's contract is one-directional — data within the delay is never
  * dropped; data beyond it "may or may not" be. Empirically a very late
  * row arriving after its window was evicted RE-CREATES the window and
  * Append re-emits it (verified on 4.1.2) — downstream consumers of
  * late-sensitive aggregations must dedupe on window start or pre-filter
  * with an explicit `ts > watermark` predicate.
  */
class WatermarkSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("watermark advances per batch; append emits only finalized windows") {
    val dir = Files.createTempDirectory("wm_stream")
    def ts(s: String) = Timestamp.valueOf(s)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    // batch 1: 09:30 and 12:00 → end-of-batch watermark 10:00
    Seq((1L, ts("2024-01-01 09:30:00"), 100L, "click", 1.0, ""),
        (2L, ts("2024-01-01 12:00:00"), 100L, "click", 1.0, ""))
      .toDF(cols: _*).coalesce(1).write.parquet(dir.resolve("b1").toString)
    // batch 2: 12:30 on-time → watermark 10:30
    Seq((3L, ts("2024-01-01 12:30:00"), 100L, "click", 1.0, ""))
      .toDF(cols: _*).coalesce(1).write.parquet(dir.resolve("b2").toString)
    // FileStreamSource orders by modification time; force a strict gap so
    // b1 always precedes b2 even on coarse-mtime filesystems
    def touch(sub: String, t: Long): Unit =
      java.nio.file.Files.walk(dir.resolve(sub)).forEach(p => p.toFile.setLastModified(t))
    val base = System.currentTimeMillis()
    touch("b1", base - 60000)
    touch("b2", base)

    val schema = spark.read.parquet(dir.resolve("b1").toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(dir.toString)
    val q = EventStreams.hourlyRollup(stream, watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("wm_test")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // watermark progressed 0 → 10:00 → 10:30 across the micro-batches
    val wms = q.recentProgress.toIndexedSeq
      .flatMap(p => Option(p.eventTime.get("watermark")))
    assert(wms.exists(_.contains("10:00:00")), wms.mkString(","))
    assert(wms.last.contains("10:30:00"), wms.mkString(","))

    val emitted = spark.table("wm_test")
      .select(col("hour_start"), col("n_events")).as[(Timestamp, Long)]
      .collect().toMap
    // only the 09:00 window (end 10:00 ≤ final watermark) is finalized;
    // the 12:00/12:30 windows stay open in state, NOT emitted
    assert(emitted == Map(ts("2024-01-01 09:00:00") -> 1L), emitted.toString)
  }
}
