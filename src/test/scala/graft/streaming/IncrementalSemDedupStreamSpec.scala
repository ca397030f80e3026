package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streamed ingestion parity for INGEST-TIME SemDeDup (q131): the corpus
  * arrives as two staged appends; each micro-batch is near-dup-checked
  * against the index AS IT STANDS (history plus everything already
  * ingested) and then appended to the index — the foreachBatch spelling
  * of `Similarity.incrementalSemDedup`, with the index living in a
  * parquet dir exactly like q127's layout.
  *
  * What must agree with the ONE-SHOT batch run over the same data: the
  * SURVIVOR SET. A row is kept iff no cosine-≥-τ match exists among
  * history ∪ already-ingested rows — the same condition whether "already
  * ingested" arrived in this micro-batch (id <) or an earlier one. The
  * status LABEL legitimately shifts at micro-batch boundaries (a match
  * against an earlier micro-batch is `dup_of_history` to the stream —
  * that row IS index history by then — but `dup_in_batch` to the
  * one-shot), so labels are compared only up to that relabeling.
  */
class IncrementalSemDedupStreamSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("streamed micro-batch ingest keeps exactly the one-shot survivor set") {
    val sf = "/root/testdata/sf0.01"
    val cents = graft.model.IvfCentroids.blockingCells(128)
    val vecs = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val history = vecs.filter(col("vec_id") % 10 =!= 0)
    val batch = vecs.filter(col("vec_id") % 10 === 0)
    val ids = batch.select("vec_id").as[Long].collect().sorted
    val mid = ids(ids.length / 2)

    // ---- one-shot reference
    val oneShot = graft.operators.Similarity
      .incrementalSemDedup(history, batch, "vec_id", "embedding",
        tau = 0.4, centroids = cents)
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> r._2).toMap

    // ---- streamed: index dir seeded with history; two appends ingest
    val idxDir = java.nio.file.Files.createTempDirectory("semdedup_idx")
    val srcDir = java.nio.file.Files.createTempDirectory("semdedup_src")
    idxDir.toFile.deleteOnExit(); srcDir.toFile.deleteOnExit()
    val idx = s"$idxDir/index"
    history.write.mode("overwrite").parquet(idx)
    batch.filter(col("vec_id") < mid)
      .coalesce(1).write.mode("append").parquet(srcDir.toString)
    Thread.sleep(1100)
    batch.filter(col("vec_id") >= mid)
      .coalesce(1).write.mode("append").parquet(srcDir.toString)

    val decisions = scala.collection.mutable.Map.empty[Long, String]
    val ingest: (DataFrame, Long) => Unit = (mb, _) => {
      val d = graft.operators.Similarity.incrementalSemDedup(
        mb.sparkSession.read.parquet(idx), mb, "vec_id", "embedding",
        tau = 0.4, centroids = cents)
        .as[(Long, String, Option[Long])](
          org.apache.spark.sql.Encoders.product[(Long, String, Option[Long])])
        .collect()
      decisions.synchronized { d.foreach(r => decisions(r._1) = r._2) }
      mb.write.mode("append").parquet(idx) // the q127 index append
    }
    val q = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
      .writeStream.foreachBatch(ingest)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    assert(decisions.keySet == oneShot.keySet, "one decision per batch row")
    val keptStream = decisions.filter(_._2 == "kept").keySet
    val keptOnce = oneShot.filter(_._2 == "kept").keySet
    assert(keptStream == keptOnce.toSet,
      s"survivor sets differ: stream-only=${keptStream -- keptOnce}, " +
        s"oneshot-only=${keptOnce.toSet -- keptStream}")
    // labels agree up to the boundary relabeling: a one-shot
    // dup_of_history can never become dup_in_batch in the stream (the
    // index only GAINS rows), and dup counts must be non-vacuous
    for ((id, s) <- oneShot if s == "dup_of_history")
      assert(decisions(id) == "dup_of_history", s"$id lost its history dup")
    assert(keptStream.size < decisions.size, "no dups found — vacuous")
  }
}
