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

  test("all-NULL group surfaces with NULL quantiles (PERCENTILE_CONT semantics)") {
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", None), ("b", None))
      .toDF("k", "v")
    val out = Quantiles
      .exactInterpolated(df, "k", "v", Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("a").contains(2.0))
    assert(out.contains("b") && out("b").isEmpty) // row present, quantile NULL
  }

  test("single-row group returns the value at every quantile") {
    val df = Seq(("a", 42.0), ("b", 1.0), ("b", 2.0)).toDF("k", "v")
    val out = Quantiles
      .exactInterpolated(df, "k", "v", Seq("p50" -> 0.5, "p99" -> 0.99))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("a") == ((42.0, 42.0)))
    assert(out("b")._1 == 1.5) // (2-1)*0.5 interpolation
  }

  test("approxSketch stays within GK rank error of the exact quantiles") {
    val li = Tables.lineitem(spark, sf)
    val qs = Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99)
    val exact = Quantiles.exactInterpolated(li, "l_returnflag", "l_extendedprice", qs)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Quantiles.approxSketch(li, "l_returnflag", "l_extendedprice", qs)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet)
    // rank error ≈ 1/accuracy; the sketch returns a SAMPLE at a rank
    // within the bound while exactInterpolated interpolates between
    // ranks, so bracket with a 10× margin (still ±0.1% rank — compare
    // via bracketing quantiles, not value deltas: values jump at rank
    // boundaries)
    val eps = 10.0 / 10000
    for (k <- exact.keySet; (_, q) <- qs) {
      val bracket = Quantiles.exactInterpolated(
        li.filter(col("l_returnflag") === k), "l_returnflag", "l_extendedprice",
        Seq("lo" -> math.max(0.0, q - eps), "hi" -> math.min(1.0, q + eps)))
        .collect()(0)
      val a = approx(k).getDouble(qs.indexWhere(_._2 == q) + 1)
      assert(a >= bracket.getDouble(1) - 1e-9 && a <= bracket.getDouble(2) + 1e-9,
        s"group $k q=$q: sketch $a outside [${bracket.getDouble(1)}, ${bracket.getDouble(2)}]")
    }
  }

  test("approxSketch plan is one partial+final agg, no sort, no window") {
    val li = Tables.lineitem(spark, sf)
    val plan = Quantiles
      .approxSketch(li, "l_returnflag", "l_extendedprice", Seq("p50" -> 0.5))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("partial_percentile_approx"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
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
