package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the round-9 Spread rework: spread a too-small file scan,
  * and NEVER touch (or physically plan) anything else — streams,
  * in-memory relations, or scans that already fill every core. The
  * round-8 lesson: a blanket rollout of the spread doubled cheap
  * fused-expression queries at sf0.1, and the old `df.rdd` probe both
  * compiled a throwaway physical plan per call site and threw on
  * streaming inputs.
  */
class SpreadSpec extends AnyFunSuite with SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("single-file scan above the bytes/core floor is spread to all cores") {
    // sf0.1 documents ≈ 0.6 MB → ~150 KB/core at local[4]: above the
    // 64 KB/core floor, single row group → must spread
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val p = plan(Spread.ensure(df))
    assert(p.contains("RoundRobinPartitioning"), p)
  }

  test("input below the bytes/core floor passes through (exchange can't pay for itself)") {
    // sf0.001 documents ≈ 0.1 MB → ~25 KB/core at local[4]: the r8 A/B
    // regime where a blanket spread COST 1.2-2x — must NOT spread
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val out = Spread.ensure(df)
    assert(out eq df, "sub-floor input must be returned untouched")
  }

  test("in-memory (non-file) relation passes through with no exchange") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    val out = Spread.ensure(df)
    assert(out eq df, "non-file input must be returned untouched")
  }

  test("streaming DataFrame passes through untouched (no planning, no throw)") {
    val stream = spark.readStream
      .format("rate").option("rowsPerSecond", "1").load()
    val out = Spread.ensure(stream)
    assert(out eq stream, "streaming input must be returned untouched")
  }

  test("scan with >= cores files short-circuits without spreading") {
    val dir = java.nio.file.Files.createTempDirectory("spread_many").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .repartition(8) // > local[4] cores -> 8 files on disk
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val out = Spread.ensure(df)
    assert(out eq df, "many-file scan must not be re-shuffled")
  }

  test("spread result is deterministic row-set (round-robin moves, never drops)") {
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id")
    val before = df.collect().map(_.getLong(0)).sorted.toSeq
    val after = Spread.ensure(df).collect().map(_.getLong(0)).sorted.toSeq
    assert(before == after)
  }
}
