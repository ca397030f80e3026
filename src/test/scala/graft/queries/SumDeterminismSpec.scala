package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-10 money-aggregation contract: `sumR2`-style
  * aggregation (per-row exact integer cents, LONG sum) is
  * order-independent, while the r9 `r2(sum(x))` spelling (round AFTER
  * a double sum) provably is not — the first full sf1 oracle replay
  * caught q03 flipping one brand's cents digit because Spark and
  * DuckDB accumulated the same group in different orders.
  *
  * The adversarial frame makes the hazard deterministic instead of
  * waiting for a lucky shuffle: with A = 2^46 (ulp 1/64), the group
  * {A, -A, 0.455} sums to 0.455 when A cancels first but to
  * A ⊕ 0.455 ⊖ A = 0.453125 when it doesn't — one cent apart after
  * 2dp rounding. Real sf1 groups hit the same cliff statistically
  * (240k-row brand sums reach 1e9+ where accumulation-order divergence
  * crosses half-cent boundaries).
  */
class SumDeterminismSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // the CoreQueries/EngineQueries/StorageQueries helpers are private;
  // the CONTRACT is the formula, re-spelled here exactly as the query
  // and oracle sides spell it
  private def sumR2(c: Column): Column =
    sum(floor(c * 100 + lit(0.50001)).cast("long")) / 100.0
  private def postSumR2(c: Column): Column =
    floor(sum(c) * 100 + lit(0.50001)) / 100

  private val bigA = math.pow(2, 46) // ulp = 2^-6: absorbs ±0.0078 per op

  /** One group per ordering scenario; `ord` pins the accumulation order
    * through sortWithinPartitions + coalesce(1).
    */
  private def frame(order: Seq[Double]) =
    order.zipWithIndex.map { case (v, i) => ("g", i, v) }
      .toDF("k", "ord", "v")
      .coalesce(1)
      .sortWithinPartitions("ord")

  test("the r9 post-sum spelling IS order-dependent (the hazard is real)") {
    val cancelFirst = frame(Seq(bigA, -bigA, 0.455))  // A-A, then +0.455
    val absorbFirst = frame(Seq(bigA, 0.455, -bigA))  // (A+0.455)-A
    val a = cancelFirst.groupBy("k").agg(postSumR2(col("v")).as("t"))
      .select("t").as[Double].head()
    val b = absorbFirst.groupBy("k").agg(postSumR2(col("v")).as("t"))
      .select("t").as[Double].head()
    assert(a == 0.46 && b == 0.45,
      s"expected the two accumulation orders to disagree by a cent, got $a / $b")
  }

  test("sumR2 is identical under any accumulation order or partitioning") {
    val orders = Seq(
      Seq(bigA, -bigA, 0.455),
      Seq(bigA, 0.455, -bigA),
      Seq(0.455, bigA, -bigA))
    val results = orders.map { o =>
      frame(o).groupBy("k").agg(sumR2(col("v")).as("t"))
        .select("t").as[Double].head()
    }
    assert(results.distinct.size == 1,
      s"sumR2 varied with accumulation order: $results")
    // partial-aggregate path: many partitions, merge order up to Spark
    val spread = frame(orders.head).repartition(7)
      .groupBy("k").agg(sumR2(col("v")).as("t"))
      .select("t").as[Double].head()
    assert(spread == results.head,
      s"sumR2 varied between single-partition and partial-agg plans: " +
        s"$spread vs ${results.head}")
  }

  test("sumR2 equals the plain decimal expectation at money magnitudes") {
    // ordinary magnitudes (every cents value exactly representable):
    // sumR2 == the infinite-precision sum of per-row-rounded cents
    val vals = Seq(19.99, 0.01, 100.004, 249.996, -0.005, 1234567.89)
    val expected =
      vals.map(v => math.floor(v * 100 + 0.50001).toLong).sum / 100.0
    val got = frame(vals).groupBy("k").agg(sumR2(col("v")).as("t"))
      .select("t").as[Double].head()
    assert(got == expected, s"$got != $expected")
  }
}
