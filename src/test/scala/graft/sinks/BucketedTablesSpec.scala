package graft.sinks

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The point of bucketing: a fact⋈fact join on the bucket key plans with
  * NO shuffle exchange on either side.
  */
class BucketedTablesSpec extends AnyFunSuite with SparkTestBase {

  test("join of two tables bucketed on the key is shuffle-free and correct") {
    val sf = "/root/testdata/sf0.001"
    val priorThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      BucketedTables.writeBucketed(
        Tables.lineitem(spark, sf), "li_bucketed", "l_orderkey", 8,
        sortCol = Some("l_orderkey"))
      BucketedTables.writeBucketed(
        Tables.orders(spark, sf), "ord_bucketed", "o_orderkey", 8,
        sortCol = Some("o_orderkey"))

      val joined = BucketedTables.table(spark, "li_bucketed")
        .join(
          BucketedTables.table(spark, "ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan) // co-located
      // and the same join WITHOUT bucketing does shuffle
      val unbucketed = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
      // correctness
      assert(joined.count() == unbucketed.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
