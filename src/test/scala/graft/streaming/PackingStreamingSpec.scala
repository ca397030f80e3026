package graft.streaming

import graft.SparkTestBase
import graft.operators.Packing
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The streaming packer must reproduce the batch greedy packer EXACTLY,
  * including when the input arrives split across micro-batches: a pack
  * left half-full by one batch keeps filling in the next (the state
  * store carries the open pack), and an oversize document still gets a
  * bin of its own.
  */
class PackingStreamingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // group 1: 300+200 fill bin 0 exactly (cap 512), then 600 (oversize)
  // alone in bin 1 — 600 arrives in batch 2, so bin 0's closure crosses
  // the micro-batch boundary; then 100+412 fill bin 2 exactly, 1 opens
  // bin 3. group 2: 500, then 20 overflows into bin 1 across batches.
  private val batch1 =
    Seq((1L, 1L, 300L), (1L, 2L, 200L), (2L, 1L, 500L))
  private val batch2 =
    Seq((1L, 3L, 600L), (1L, 4L, 100L), (1L, 5L, 412L), (1L, 6L, 1L),
      (2L, 2L, 20L), (2L, 3L, -7L)) // negative size ⇒ 0, stays in bin

  private def expected: Map[(Long, Long), Long] = {
    val df = (batch1 ++ batch2).toDF("group", "seq", "size")
    Packing.greedyPack(df, "group", "size", Seq("seq"), capacity = 512L)
      .select("group", "seq", "bin").as[(Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
  }

  test("streaming greedy pack == batch greedyPack across micro-batch " +
    "boundaries (open pack carried in state)") {
    val dir = Files.createTempDirectory("pack_stream")
    batch1.toDF("group", "seq", "size").coalesce(1)
      .write.parquet(dir.resolve("b1").toString)
    batch2.toDF("group", "seq", "size").coalesce(1)
      .write.parquet(dir.resolve("b2").toString)

    val schema = spark.read.parquet(dir.resolve("b1").toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(dir.toString)
      .as[PackingStreaming.PackDoc]

    val q = PackingStreaming.greedy(stream, capacity = 512L)
      .writeStream.format("memory").queryName("pack_stream_test")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("pack_stream_test")
      .select("group", "seq", "bin").as[(Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == expected)
    // the boundary-crossing fills really happened
    assert(got((1L, 2L)) == 0L)           // bin 0 filled in batch 1
    assert(got((1L, 3L)) == 1L)           // oversize doc alone, batch 2
    assert(got((2L, 2L)) == 1L)           // 500+20 > 512 ⇒ overflow bin
    assert(got((2L, 3L)) == 1L)           // size 0 never overflows
  }
}
