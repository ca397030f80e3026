package graft.operators

import graft.{SparkEntry, SparkTestBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The retrieval index family's incremental contract:
  * merge(state(history), state(batch)) must be indistinguishable from a
  * full rebuild — for the rendered inverted index (q102 parity), for
  * BM25 serving (q101 parity, corpus never touched at query time), and
  * under the STREAMED spelling (foreachBatch appends one partial state
  * per micro-batch; the stored states read back and merged equal the
  * rebuild). The driver's q128 oracle re-proves the first claim against
  * DuckDB; these specs pin the other two and the streaming path.
  */
class IncrementalIndexSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))

  private def assertSame(a: DataFrame, b: DataFrame, what: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"$what differs")

  test("merged index == q102 full rebuild, postings byte-identical") {
    val merged = SparkEntry.queries("q128_incremental_index")(spark, sf)
    val rebuilt = SparkEntry.queries("q102_inverted_index")(spark, sf)
    assertSame(merged, rebuilt, "merged vs rebuilt inverted index")
  }

  test("three-way merge (arbitrary slicing) == rebuild") {
    val slices = (0 until 3).map(r =>
      IncrementalIndex.state(docs.filter(col("doc_id") % 3 === r)))
    val merged = IncrementalIndex.render(IncrementalIndex.merge(slices: _*))
    val rebuilt = IncrementalIndex.render(IncrementalIndex.state(docs))
    assertSame(merged, rebuilt, "3-way merged index")
  }

  test("BM25 served from maintained state == q101 served from the corpus") {
    val hist = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val tokenState = IncrementalIndex.merge(
      IncrementalIndex.state(hist), IncrementalIndex.state(batch))
    val docState = IncrementalIndex.docState(hist)
      .unionByName(IncrementalIndex.docState(batch))
    val fromState = IncrementalIndex.bm25FromState(
      tokenState, docState, Seq("spark", "merge", "window"), 20)
    val fromCorpus = SparkEntry.queries("q101_bm25_topk")(spark, sf)
    assertSame(fromState, fromCorpus, "BM25 from state vs corpus")
  }

  test("deletes retract exactly: applyDeletes(state(A ∪ B), B) == state(A)") {
    val keep = docs.filter(col("doc_id") % 10 =!= 0)
    val gone = docs.filter(col("doc_id") % 10 === 0)
    val afterDelete = IncrementalIndex.applyDeletes(
      IncrementalIndex.state(docs), gone)
    val rebuilt = IncrementalIndex.state(keep)
    assertSame(IncrementalIndex.render(afterDelete),
      IncrementalIndex.render(rebuilt), "post-delete state")
    // deleting everything leaves an empty index (zero-count groups vanish)
    assert(IncrementalIndex.applyDeletes(
      IncrementalIndex.state(docs), docs).isEmpty)
  }

  test("streamed maintenance: foreachBatch partial states == rebuild") {
    // corpus arrives as two parquet appends; each micro-batch tokenizes
    // ONLY its own files and appends its partial token state to the
    // stored index dir — the corpus is never re-scanned. Reading the
    // partials back and merging is the serving-time index.
    val srcDir = java.nio.file.Files.createTempDirectory("incidx_src")
    val stateDir = java.nio.file.Files.createTempDirectory("incidx_state")
    srcDir.toFile.deleteOnExit(); stateDir.toFile.deleteOnExit()
    val statePath = s"$stateDir/token_state"

    val hist = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    hist.coalesce(1).write.mode("append").parquet(srcDir.toString)
    Thread.sleep(1100) // distinct mod times -> stable append order
    batch.coalesce(1).write.mode("append").parquet(srcDir.toString)

    val stream = spark.readStream
      .schema(hist.schema)
      .option("maxFilesPerTrigger", "1") // one append per micro-batch
      .parquet(srcDir.toString)
    // explicit function type: foreachBatch has a Java SAM overload and a
    // bare lambda is ambiguous under Scala 2.13
    val ingest: (DataFrame, Long) => Unit = (mb, _) =>
      IncrementalIndex.state(mb).write.mode("append").parquet(statePath)
    val q = stream.writeStream
      .foreachBatch(ingest)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val served = IncrementalIndex.render(
      IncrementalIndex.merge(spark.read.parquet(statePath)))
    val rebuilt = IncrementalIndex.render(IncrementalIndex.state(docs))
    assertSame(served, rebuilt, "streamed state vs rebuild")
  }
}
