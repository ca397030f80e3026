package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** Triangle counting pinned against brute-force enumeration of the same
  * co-purchase graph — adjacency sets in plain Scala, no shared code
  * with the degree-ordered Spark pipeline.
  */
class GraphQueriesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q110: per-node counts match brute-force triangle enumeration") {
    import spark.implicits._
    val co = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_partkey").as[(Long, Long)].collect()
      .distinct
    val edges = co.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u
    }
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    edges.foreach { case (u, v) =>
      // common neighbors ABOVE v close a (u, v, w) triangle exactly once
      (adj(u) & adj(v)).filter(_ > v).foreach { w =>
        counts(u) += 1; counts(v) += 1; counts(w) += 1
      }
    }
    val got = SparkEntry.queries("q110_triangle_count")(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got == counts.toMap, {
      val onlyGot = got.keySet -- counts.keySet
      val onlyWant = counts.keySet -- got.keySet
      s"mismatch: extra=$onlyGot missing=$onlyWant " +
        s"diff=${got.collect { case (k, v) if counts(k) != v => (k, v, counts(k)) }.take(5)}"
    })
    assert(got.values.sum % 3 == 0, "each triangle contributes exactly 3 node counts")
    assert(got.nonEmpty, "fixture graph has no triangles — test is vacuous")
  }

  test("q129: sampled estimate lands inside its own 15% envelope, exact side == q110") {
    // the driver's oracle proves both engines compute the same row; this
    // pins the row's CLAIMS — the estimator really is within bound (not
    // just deterministically wrong in both engines), and the in-query
    // exact yardstick agrees with q110's per-part credits
    import spark.implicits._
    val row = SparkEntry.queries("q129_triangle_approx")(spark, sf)
      .as[(Long, Double, Boolean)].collect().head
    val (nExact, nEst, within) = row
    assert(within, s"estimate $nEst outside the 15% envelope of $nExact")
    assert(math.abs(nEst - nExact) / nExact.toDouble <= 0.15)
    val from110 = SparkEntry.queries("q110_triangle_count")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_triangles"))
      .as[Long].collect().head
    assert(from110 == 3 * nExact,
      s"q129 exact side ($nExact) disagrees with q110 credits/3 (${from110 / 3})")
  }

  test("q129: production arm (yardstick off) keeps the estimate, nulls the check") {
    // bench/100 TB deployments disable the exact O(E^1.5) branch; the
    // sampled estimate must be bit-identical to the default arm's and
    // the yardstick columns NULL (same schema either way)
    import spark.implicits._
    val default = SparkEntry.queries("q129_triangle_approx")(spark, sf)
      .as[(Option[Long], Double, Option[Boolean])].collect().head
    spark.conf.set("spark.graft.triangle.exactYardstick", "false")
    try {
      val off = SparkEntry.queries("q129_triangle_approx")(spark, sf)
        .as[(Option[Long], Double, Option[Boolean])].collect().head
      assert(off._1.isEmpty && off._3.isEmpty,
        s"yardstick columns not NULL with the branch off: $off")
      assert(off._2 == default._2,
        s"estimate changed across arms: ${off._2} vs ${default._2}")
    } finally spark.conf.unset("spark.graft.triangle.exactYardstick")
  }
}
