package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the 100 TB semi-join reduction:
  * when a join's small side carries a selective filter, Catalyst can
  * inject a bloom filter of the small side's join keys into the BIG
  * side's scan, discarding non-joining rows before the shuffle. On a
  * 1000-executor cluster this is the difference between shuffling the
  * full fact table and shuffling the ~matching slice.
  *
  * The application-side size threshold defaults to 10 GB, so local test
  * data never triggers injection by default — the spec lowers the
  * thresholds to force the decision and asserts both the plan shape and
  * result equality.
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("bloom filter is injected into the fact-side scan and preserves results") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // broadcast joins skip runtime-filter injection — force a shuffle join
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val dim = Tables.part(spark, sf).filter(col("p_size") === 1) // selective
      val fact = Tables.lineitem(spark, sf)
      val joined = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.optimizedPlan.toString
      assert(
        plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no bloom filter injected:\n$plan")

      val withFilter = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(withFilter == without)
      assert(withFilter.nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
