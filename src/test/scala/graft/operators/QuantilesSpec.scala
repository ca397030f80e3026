package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantilesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("exactInterpolated matches builtin percentile on real data") {
    val li = Tables.lineitem(spark, sf)
    val qs = Seq("q0" -> 0.0, "p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95,
      "p99" -> 0.99, "q1" -> 1.0)
    val ours = Quantiles
      .exactInterpolated(li, "l_returnflag", "l_extendedprice", qs)
      .collect().map(r => r.getString(0) -> r).toMap
    val builtin = li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.0)").as("q0"),
        expr("percentile(l_extendedprice, 0.25)").as("p25"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"),
        expr("percentile(l_extendedprice, 0.99)").as("p99"),
        expr("percentile(l_extendedprice, 1.0)").as("q1"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(ours.keySet == builtin.keySet)
    for (k <- ours.keySet; i <- 1 to qs.length) {
      val (a, b) = (ours(k).getDouble(i), builtin(k).getDouble(i))
      assert(math.abs(a - b) <= math.ulp(b) * 4, s"group $k q#$i: $a vs $b")
    }
  }

  test("single-row group returns the value at every quantile") {
    val df = Seq(("a", 42.0), ("b", 1.0), ("b", 2.0)).toDF("k", "v")
    val out = Quantiles
      .exactInterpolated(df, "k", "v", Seq("p50" -> 0.5, "p99" -> 0.99))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("a") == ((42.0, 42.0)))
    assert(out("b")._1 == 1.5) // (2-1)*0.5 interpolation
  }

  test("the plan aggregates only quantile-position rows (filter before agg)") {
    val li = Tables.lineitem(spark, sf)
    val out = Quantiles
      .exactInterpolated(li, "l_returnflag", "l_extendedprice", Seq("p50" -> 0.5))
    val plan = out.queryExecution.executedPlan.toString()
    // the final HashAggregate must sit above a Filter on __rn, so the
    // expensive agg sees O(groups × quantiles) rows, not the full table
    assert(plan.contains("__rn"), plan.take(2000))
  }
}
