package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class RobustSourcesSpec extends AnyFunSuite with SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("qty", IntegerType)))

  test("jsonLinesWithQuarantine routes bad lines aside, good rows parse clean") {
    val dir = java.nio.file.Files.createTempDirectory("robust_json")
    dir.toFile.deleteOnExit()
    val lines = Seq(
      """{"id": 1, "name": "alpha", "qty": 3}""",
      """{"id": 2, "name": "beta" BROKEN""", // malformed JSON
      """{"id": "not-a-number", "name": "gamma", "qty": 1}""", // type clash
      """{"id": 4, "name": "delta", "qty": null}""") // null field is VALID
    java.nio.file.Files.write(dir.resolve("part-0.json"),
      String.join("\n", lines: _*).getBytes("UTF-8"))

    val parsed = RobustSources.jsonLinesWithQuarantine(
      spark, dir.toString, schema)
    val good = RobustSources.good(parsed).collect()
    val bad = RobustSources.quarantine(parsed)
      .select("raw_record").collect().map(_.getString(0))

    assert(good.map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))
    assert(bad.length == 2)
    assert(bad.exists(_.contains("BROKEN")))
    assert(bad.exists(_.contains("not-a-number")))
  }

  test("binaryBlobs reads opaque files with length + content, glob prunes") {
    val dir = java.nio.file.Files.createTempDirectory("robust_bin")
    dir.toFile.deleteOnExit()
    val payload = Array.tabulate[Byte](257)(i => (i % 251).toByte)
    java.nio.file.Files.write(dir.resolve("clip_a.fakeimg"), payload)
    java.nio.file.Files.write(dir.resolve("clip_b.fakeimg"), payload.take(10))
    java.nio.file.Files.write(dir.resolve("notes.txt"), "skip me".getBytes)

    val blobs = RobustSources.binaryBlobs(spark, dir.toString, "*.fakeimg")
    val rows = blobs.orderBy("path").collect()
    assert(rows.length == 2) // txt pruned at listing time
    assert(rows.map(_.getLong(1)).toSeq == Seq(257L, 10L))
    assert(rows.head.getAs[Array[Byte]]("content").toSeq == payload.toSeq)

    // the blob column feeds the multimodal feature stage directly
    val feats = graft.operators.Multimodal.extractFeatures(
      blobs.withColumnRenamed("content", "payload"), "payload", dim = 8)
    assert(feats.count() == 2)
  }

  test("ORC round-trip: events table is bit-identical through the ORC format") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("orc_rt")
    dir.toFile.deleteOnExit()
    ev.write.mode("overwrite").orc(dir.toString)
    val back = spark.read.orc(dir.toString)
    assert(back.schema == ev.schema)
    val a = ev.collect().map(_.toSeq.map(String.valueOf(_)).mkString("|")).sorted
    val b = back.collect().map(_.toSeq.map(String.valueOf(_)).mkString("|")).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("evolvedParquet: mixed-vintage directory reads under the merged schema") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve")
    dir.toFile.deleteOnExit()
    // v1 files: (id, name); v2 files add a quality score
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
      .write.mode("append").parquet(dir.toString)
    Seq((3L, "gamma", 0.9), (4L, "delta", 0.2)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir.toString)

    val merged = RobustSources.evolvedParquet(spark, dir.toString)
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))
    val rows = merged.orderBy("id")
      .select("id", "score").as[(Long, Option[Double])].collect()
    assert(rows.toSeq == Seq(
      1L -> None, 2L -> None, 3L -> Some(0.9), 4L -> Some(0.2)))

    // the DEFAULT read must not silently drop the evolved column in a
    // mixed directory... it may or may not, depending on which footer
    // wins — which is exactly why evolvedParquet pins mergeSchema on.
    val defaultCols = spark.read.parquet(dir.toString).columns.toSet
    assert(defaultCols.contains("id"))
  }
}
