package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsQueriesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q117: window skyline equals brute-force dominance") {
    import spark.implicits._
    val pts = Tables.orders(spark, sf)
      .selectExpr("o_orderkey",  "o_totalprice",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS day")
      .as[(Long, Double, Long)].collect()
    val want = pts.filter { p =>
      !pts.exists(q =>
        q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3))
    }.map(_._1).toSet
    val got = SparkEntry.queries("q117_skyline")(spark, sf)
      .select("o_orderkey").as[Long].collect().toSet
    assert(got == want)
    assert(want.nonEmpty && want.size < pts.length,
      "degenerate frontier — test is vacuous")
  }

  test("q120: per-source KL equals an in-memory replay; uniform-corpus KL is zero") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .selectExpr("source", "CAST(floor(log2(n_chars)) AS LONG)")
      .as[(String, Long)].collect()
    val n = docs.length.toDouble
    val byBucket = docs.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val want = docs.groupBy(_._1).map { case (src, rows) =>
      val ns = rows.size.toDouble
      val kl = rows.groupBy(_._2).values.map { b =>
        val p = b.size / ns
        p * math.log(p / (byBucket(b.head._2) / n))
      }.sum
      src -> (rows.size.toLong, math.floor(kl * 1e6 + 0.50001) / 1e6)
    }
    val got = SparkEntry.queries("q120_source_kl")(spark, sf)
      .as[(String, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got == want)
    assert(got.values.exists(_._2 > 0), "all-zero KL — test is vacuous")
  }

  test("q121: per-key OLS matches a closed-form in-memory fit") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(ts AS DATE) AS day")
      .groupBy("event_type", "day").count()
      .selectExpr("event_type",
        "CAST(datediff(day, DATE'2024-01-01') AS DOUBLE)",
        "CAST(count AS DOUBLE)")
      .as[(String, Double, Double)].collect()
    def r6(v: Double) = math.floor(v * 1e6 + 0.50001) / 1e6
    val want = daily.groupBy(_._1).map { case (k, rows) =>
      val n = rows.length.toDouble
      val (mx, my) = (rows.map(_._2).sum / n, rows.map(_._3).sum / n)
      val sxy = rows.map(r => (r._2 - mx) * (r._3 - my)).sum
      val sxx = rows.map(r => (r._2 - mx) * (r._2 - mx)).sum
      val syy = rows.map(r => (r._3 - my) * (r._3 - my)).sum
      val slope = sxy / sxx
      k -> ((rows.length.toLong, r6(slope), r6(my - slope * mx),
        r6(sxy * sxy / (sxx * syy))))
    }
    val got = SparkEntry.queries("q121_trend_fit")(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(got == want)
  }

  test("q122: attribution equals a per-user path replay") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .filter("event_type IN ('view','click','purchase')")
      .selectExpr("user_id", "event_type", "unix_micros(ts)", "event_id")
      .as[(Long, String, Long, Long)].collect()
    val want = ev.groupBy(_._1).flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._4))
      // split into paths ending at each purchase; attribute the touches
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var touches = List.empty[(String, Long, Long)]
      ordered.foreach {
        case (u, "purchase", _, id) =>
          if (touches.nonEmpty) out += ((id, touches.size.toLong))
          touches = Nil
        case (_, t, ts, id) => touches = touches :+ ((t, ts, id))
      }
      out
    }.toMap
    val got = SparkEntry.queries("q122_attribution")(spark, sf)
      .selectExpr("purchase_id", "n_touches")
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(want.nonEmpty, "no attributed purchases — test is vacuous")
  }

  test("q118: transition matrix equals an in-memory replay and is row-stochastic") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(ts)", "event_id")
      .as[(Long, String, Long, Long)].collect()
    val pairs = ev.groupBy(_._1).values.flatMap { rows =>
      val ordered = rows.sortBy(r => (r._3, r._4)).map(_._2)
      ordered.zip(ordered.drop(1))
    }.toSeq
    val want = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("q118_transitions")(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(got.map(t => (t._1, t._2) -> t._3).toMap == want)
    // probabilities sum to ~1 per from_type (rounding leaves ≤ 1e-4 slack)
    got.groupBy(_._1).foreach { case (from, rows) =>
      val s = rows.map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-4, s"from=$from sums to $s")
    }
  }
}
