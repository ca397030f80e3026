package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** The storage-layout queries' RESULTS are oracle-checked by the driver;
  * what needs asserting here is the PLAN — the layout must actually buy
  * what the Scaladoc claims (no exchanges, pruned partitions, a bloom
  * probe on the fact scan), or the queries are just slow re-spellings of
  * their oracles.
  */
class StorageQueriesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q96: bucketed join plans with ZERO exchanges and ZERO sorts") {
    val plan = planOf("q96_bucketed_join")
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketing failed to remove exchanges:\n$plan")
    // bucket-sorted on the join key: SMJ needs no Sort operators either
    assert(!plan.contains("+- Sort "), s"sortBy metadata unused:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan not bucket-aware:\n$plan")
  }

  test("q96: result matches the plain (non-bucketed) join exactly") {
    import org.apache.spark.sql.functions._
    val bucketed = SparkEntry.queries("q96_bucketed_join")(spark, sf)
    val plain = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus")
      .join(
        graft.Tables.lineitem(spark, sf)
          .select("l_orderkey", "l_extendedprice", "l_discount"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_lines"),
        // same order-independent exact-cents aggregation as sumR2 —
        // post-sum rounding would depend on accumulation order here
        (sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100
          + lit(0.50001)).cast("long")) / 100.0).as("net_total"))
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
  }

  test("q97: the day filter prunes partitions at the directory level") {
    val plan = planOf("q97_partition_prune")
    // partition filters resolved against the listing, not the data
    assert(plan.contains("PartitionFilters"), plan)
    // 3 of 30 days survive: the scan's input files must be the pruned set
    val df = SparkEntry.queries("q97_partition_prune")(spark, sf)
    val files = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(files.nonEmpty && files.forall(_ == 3),
      s"expected 3 surviving day-partitions, got $files")
  }

  test("q126: probe cells prune the IVF cell-partitioned layout at the directory level") {
    val plan = planOf("q126_ivf_partition_prune")
    assert(plan.contains("PartitionFilters"), plan)
    val df = SparkEntry.queries("q126_ivf_partition_prune")(spark, sf)
    val parts = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("embeddings_by_cell")) =>
        f.selectedPartitions.partitionCount
    }
    // 3 queries × 4 probes can touch at most 12 distinct cells of 16 —
    // the listing must prove at least 4 cell directories were never read
    assert(parts.nonEmpty && parts.forall(p => p > 0 && p <= 12),
      s"expected ≤12 surviving cell-partitions of 16, got $parts")
  }

  test("q127: the incrementally-appended IVF layout prunes exactly like q126's") {
    val df = SparkEntry.queries("q127_ivf_append")(spark, sf)
    val parts = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("embeddings_by_cell_incr")) =>
        f.selectedPartitions.partitionCount
    }
    // append must not cost the layout its pruning: same ≤12-of-16 bound
    assert(parts.nonEmpty && parts.forall(p => p > 0 && p <= 12),
      s"expected ≤12 surviving cell-partitions of 16, got $parts")
  }

  test("q98: a bloom probe from the dimension side lands on the fact scan") {
    val plan = planOf("q98_bloom_prune_join")
    assert(plan.contains("might_contain"),
      s"runtime bloom filter was not injected:\n$plan")
  }

  test("q100: the range-sorted layout decodes a fraction of the plain layout's rows") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      val qe = df.queryExecution
      df.collect() // run THIS QueryExecution so its scan metrics populate
      val plan = qe.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      plan.collect {
        case f: FileSourceScanExec => f.metrics("numOutputRows").value
      }.sum
    }
    val filt = col("l_extendedprice") >= 900.0 && col("l_extendedprice") < 5000.0
    val total = graft.Tables.lineitem(spark, sf).count()
    // plain layout: every row group's band spans the whole price range,
    // footer stats prune nothing, the scan decodes the full table
    val plain = scanRows(graft.Tables.lineitem(spark, sf)
      .select("l_extendedprice", "l_quantity").filter(filt))
    val sorted = scanRows(SparkEntry.queries("q100_range_layout")(spark, sf))
    assert(plain == total, s"plain layout should decode all $total rows, got $plain")
    assert(sorted < total / 2,
      s"range-sorted layout should skip most row groups: decoded $sorted of $total")
  }

  test("q109: the Z-order layout decodes a fraction of the plain layout under a 2-D box") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      val qe = df.queryExecution
      df.collect()
      val plan = qe.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      plan.collect {
        case f: FileSourceScanExec => f.metrics("numOutputRows").value
      }.sum
    }
    val box = col("l_partkey") < 60 && col("l_suppkey") < 4
    val total = graft.Tables.lineitem(spark, sf).count()
    val plain = scanRows(graft.Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey", "l_quantity").filter(box))
    val zordered = scanRows(SparkEntry.queries("q109_zorder_layout")(spark, sf))
    // the plain single-file layout has one all-covering row group: no skip
    assert(plain == total, s"plain layout should decode all $total rows, got $plain")
    assert(zordered < total / 2,
      s"Z-order layout should skip most row groups under the box: decoded $zordered of $total")
  }

  test("q99: planted duplicates are attributed to history, batch, or kept") {
    import spark.implicits._
    val out = SparkEntry.queries("q99_incremental_dedup")(spark, sf)
      .as[(Long, String, Option[Long])].collect()
    assert(out.nonEmpty)
    // every batch doc is classified, and dup targets are never in-batch
    // rows that come later than the duplicate
    assert(out.forall(r => Set("kept", "dup_of_history", "dup_in_batch")(r._2)))
    out.filter(_._2 == "dup_in_batch").foreach { r =>
      assert(r._3.exists(_ < r._1), s"batch dup $r must point to an earlier row")
    }
    out.filter(_._2 == "kept").foreach(r => assert(r._3.isEmpty))
  }
}
