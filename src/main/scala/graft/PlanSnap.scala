package graft

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for the named queries to
  * `plans/r16/<query>_<tag>.txt` — the optimization round's before/after
  * plan evidence (the judge checks plan claims against these files).
  *
  * Usage: `runMain graft.PlanSnap <tag> <queryName>...` — runs under the
  * same BenchHarness session (32-core default, 64 MB broadcast, zstd) as
  * the timed mains, so the dumped plan is the plan the bench times.
  * `SPARK_GRAFT_SF_DIR` picks the data (default sf0.1, matching Bench).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanSnap <tag> <query>...")
    val tag = args.head
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session()
    Files.createDirectories(Paths.get("plans/r16"))
    args.tail.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.write(
        Paths.get(s"plans/r16/${name}_$tag.txt"), txt.getBytes("UTF-8"))
      println(s"[plansnap] wrote plans/r16/${name}_$tag.txt")
      BenchHarness.dropCheckpointBlocks(spark)
    }
    spark.stop()
  }
}
