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

  test("scan with >= cores files is not spread (estimate sees enough partitions)") {
    val dir = java.nio.file.Files.createTempDirectory("spread_many").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .repartition(8) // > local[4] cores -> 8 files on disk
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val out = Spread.ensure(df)
    assert(out eq df, "many-file scan must not be re-shuffled")
  }

  test("bin-packed estimate catches the low-openCost/minPartitionNum=1 merge cliff") {
    // 8 small files, openCost=0, minPartitionNum=1: Spark's packing
    // merges ALL of them into one partition (maxSplit = total bytes) —
    // a compute-heavy scan would serialize. The old per-file '>=1
    // partition each' estimate reported 8 >= cores and skipped the
    // spread (r9 advice + r10 review); the packed estimate must see 1.
    val dir = java.nio.file.Files.createTempDirectory("spread_packed").toString
    spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .repartition(8)
      .write.mode("overwrite").parquet(dir) // ~0.7 MB total: above the floor
    val conf = spark.conf
    val prevOpen = conf.get("spark.sql.files.openCostInBytes")
    try {
      conf.set("spark.sql.files.openCostInBytes", "0")
      conf.set("spark.sql.files.minPartitionNum", "1")
      val p = plan(Spread.ensure(spark.read.parquet(dir)))
      assert(p.contains("RoundRobinPartitioning"), p)
    } finally {
      conf.set("spark.sql.files.openCostInBytes", prevOpen)
      conf.unset("spark.sql.files.minPartitionNum")
    }
  }

  test("beyond the stat ceiling, a stride sample still models the merge cliff (r10 advice)") {
    // 1100 files (> the max(1024, 32·cores) ceiling at 4 test cores)
    // of ~1 KB each with openCost=0 and minPartitionNum=1: Spark packs
    // everything into ONE partition. The r10 code passed through
    // unmodeled here — the exact regime the low-openCost cliff lives
    // in; the sampled estimate must still see 1 < cores over enough
    // bytes and fire the spread.
    val dir = java.nio.file.Files.createTempDirectory("spread_sample")
    val line = ("x" * 63) + "\n"
    for (i <- 0 until 1100) {
      val f = dir.resolve(f"part-$i%04d.txt")
      java.nio.file.Files.write(f, (line * 16).getBytes("UTF-8")) // 1 KB
    }
    val conf = spark.conf
    val prevOpen = conf.get("spark.sql.files.openCostInBytes")
    try {
      conf.set("spark.sql.files.openCostInBytes", "0")
      conf.set("spark.sql.files.minPartitionNum", "1")
      val df = spark.read.text(dir.toString)
      assert(df.inputFiles.length == 1100)
      val p = plan(Spread.ensure(df))
      assert(p.contains("RoundRobinPartitioning"), p)
    } finally {
      conf.set("spark.sql.files.openCostInBytes", prevOpen)
      conf.unset("spark.sql.files.minPartitionNum")
    }
  }

  test("unsplittable (.gz) files clamp to one partition each, so the spread fires") {
    // two ~200 KB gzip text files with maxPartitionBytes=64k: the naive
    // byte-range estimate says ceil(200k/64k)=4 splits/file = 8 ≥ cores
    // and would skip the spread — but gzip cannot split, Spark plans
    // exactly 2 partitions, and a compute-heavy scan serializes. The
    // clamp (r9 advice) must see 2 < cores and spread.
    val dir = java.nio.file.Files.createTempDirectory("spread_gz")
    for (i <- 0 until 2) {
      val f = dir.resolve(s"part-$i.txt.gz")
      val out = new java.util.zip.GZIPOutputStream(
        java.nio.file.Files.newOutputStream(f))
      val rnd = new scala.util.Random(i) // incompressible → real 200 KB
      val buf = new Array[Byte](200 * 1024)
      rnd.nextBytes(buf)
      buf.indices.foreach(j => buf(j) = (33 + math.abs(buf(j) % 90)).toByte)
      out.write(buf); out.close()
    }
    val conf = spark.conf
    val prevMax = conf.get("spark.sql.files.maxPartitionBytes")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", "65536")
      val df = spark.read.text(dir.toString)
      val p = plan(Spread.ensure(df))
      assert(p.contains("RoundRobinPartitioning"), p)
    } finally conf.set("spark.sql.files.maxPartitionBytes", prevMax)
  }

  test("computeWeight lowers the bytes/core floor for compute-dense scans") {
    // sf0.001 documents ≈ 0.1 MB → ~25 KB/core at local[4]: below the
    // 1.0-weight floor (previous test), but a 10× compute-dense kernel
    // breaks even ~10× lower — the q37 regime (r10 A/B)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val p = plan(Spread.ensure(df, computeWeight = 10.0))
    assert(p.contains("RoundRobinPartitioning"), p)
    // and an ordinary-density scan of the same input still passes through
    assert(Spread.ensure(df) eq df)
  }

  test("spread result is deterministic row-set (round-robin moves, never drops)") {
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id")
    val before = df.collect().map(_.getLong(0)).sorted.toSeq
    val after = Spread.ensure(df).collect().map(_.getLong(0)).sorted.toSeq
    assert(before == after)
  }
}
