package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming parity for INCREMENTAL DEDUP (the q99 shape): an appended
  * corpus — history first, a new batch later — deduplicated on content
  * fingerprints by `dropDuplicatesWithinWatermark` must make exactly the
  * keep/drop decisions the batch formulation makes against the history
  * index. This is the ingestion-time spelling of q99: state holds the
  * fingerprints seen within the watermark horizon (bounded — the
  * production contract), each append is one micro-batch, and a new row
  * whose fingerprint matches history (or an earlier row of its own
  * append) never reaches the sink.
  *
  * The corpus is synthetic because the fixture documents are all
  * distinct: the append mixes genuinely new texts, copies of history
  * texts under new ids (must drop: dup_of_history), and texts repeated
  * inside the append itself (must collapse to one: dup_in_batch).
  */
class IncrementalDedupStreamSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("streamed fingerprint dedup == q99-style batch decisions on an appended corpus") {
    val texts = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id").limit(400)
      .as[(Long, String)].collect()

    val t0 = java.sql.Timestamp.valueOf("2024-02-04 10:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(t0.getTime + sec * 1000L)

    // history: docs 0..299, one per second
    val history = texts.take(300).zipWithIndex.map { case ((id, tx), i) =>
      (id, tx, ts(i)) }
    // append: 100 new texts + 20 copies of history texts + 10 in-append
    // repeats of the first 10 new texts, all under fresh ids ≥ 10000
    val fresh = texts.slice(300, 400).map(_._2)
    val appendTexts = fresh ++ texts.take(20).map(_._2) ++ fresh.take(10)
    val append = appendTexts.zipWithIndex.map { case (tx, i) =>
      (10000L + i, tx, ts(300 + i)) }

    val histDf = history.toSeq.toDF("doc_id", "text", "ts")
      .withColumn("h", md5(col("text")))
    val appDf = append.toSeq.toDF("doc_id", "text", "ts")
      .withColumn("h", md5(col("text")))

    // ---- batch reference: q99's decisions against the history index
    val index = histDf.groupBy("h").agg(min("doc_id").as("hist_id"))
    val wBatch = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("doc_id"))
    val decisions = appDf
      .withColumn("rn", row_number().over(wBatch))
      .join(index, Seq("h"), "left")
      .select(col("doc_id"), col("h"),
        when(col("hist_id").isNotNull, lit("dup_of_history"))
          .when(col("rn") > 1, lit("dup_in_batch"))
          .otherwise(lit("kept")).as("status"))
      .collect()
    val keptH = decisions.filter(_.getString(2) == "kept").map(_.getString(1)).toSet
    assert(decisions.count(_.getString(2) == "dup_of_history") == 20)
    assert(decisions.count(_.getString(2) == "dup_in_batch") == 10)
    assert(keptH.size == 100)

    // ---- streamed: two staged appends, one micro-batch each
    val dir = java.nio.file.Files.createTempDirectory("incdedup_src")
    dir.toFile.deleteOnExit()
    histDf.coalesce(1).write.mode("append").parquet(dir.toString)
    Thread.sleep(1100) // distinct file mod times → stable append order
    appDf.coalesce(1).write.mode("append").parquet(dir.toString)

    val streamed = spark.readStream
      .schema(histDf.schema)
      .option("maxFilesPerTrigger", "1") // one append per micro-batch
      .parquet(dir.toString)
    val q = EventStreams.dedupEvents(streamed, Seq("h"), "30 minutes")
      .select("doc_id", "h")
      .writeStream
      .format("memory")
      .queryName("incdedup_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val out = spark.table("incdedup_test")
      .as[(Long, String)].collect()
    val histH = histDf.select("h").as[String].collect().toSet
    val emittedAppend = out.filter(_._1 >= 10000L)

    // every batch decision replayed: kept fingerprints pass, history
    // and in-append duplicates never reach the sink
    assert(emittedAppend.map(_._2).toSet == keptH,
      "streamed append emissions must equal the batch keep set")
    assert(emittedAppend.length == keptH.size, "in-append dups collapse to one")
    assert(emittedAppend.forall(r => !histH.contains(r._2)),
      "no append emission may duplicate a history fingerprint")
    // history append itself dedups to its distinct fingerprints
    assert(out.count(_._1 < 10000L) == histH.size)
    spark.sql("DROP TABLE IF EXISTS incdedup_test")
  }
}
