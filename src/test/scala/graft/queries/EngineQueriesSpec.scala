package graft.queries

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The engine-completeness queries are pinned primarily by their DuckDB
  * oracles; these specs cover the properties an oracle can't express —
  * cube row-count algebra, the sketch error bound at a second scale,
  * salted-join == plain-join equality, and unpivot shape.
  */
class EngineQueriesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q65 cube emits all four grouping-set combinations") {
    val out = EngineQueries.defs("q65_cube_grouping")(spark, sf)
    val byFlags = out.groupBy("g_status", "g_prio").count()
      .as[(Int, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // (0,0)=detail, (0,1)=status totals, (1,0)=priority totals, (1,1)=grand
    assert(byFlags.keySet == Set((0, 0), (0, 1), (1, 0), (1, 1)))
    assert(byFlags((1, 1)) == 1)
    // detail partition counts sum to the grand total count
    val grand = out.filter($"g_status" === 1 && $"g_prio" === 1)
      .select("n").as[Long].head()
    val detailSum = out.filter($"g_status" === 0 && $"g_prio" === 0)
      .agg(sum("n")).as[Long].head()
    assert(grand == detailSum)
  }

  test("q70 HLL sketch stays within its bound at sf0.001 too") {
    val out = EngineQueries.defs("q70_approx_distinct")(spark, sf)
      .select("within_bound").as[Boolean].collect()
    assert(out.nonEmpty && out.forall(identity))
  }

  test("q74 salted join result == plain join result") {
    val salted = EngineQueries.defs("q74_salted_join")(spark, sf)
      .as[(String, Long, Double)].collect().toSet
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_lines"),
        (sum(floor(col("l_quantity") * 100 + lit(0.50001)).cast("long")) / 100.0).as("sum_qty"))
      .as[(String, Long, Double)].collect().toSet
    assert(salted == plain)
  }

  test("q71 unpivot emits one row per money column with matching totals") {
    val out = EngineQueries.defs("q71_unpivot")(spark, sf)
      .as[(String, Double)].collect().toMap
    assert(out.keySet == Set("l_extendedprice", "l_discount", "l_tax"))
    val direct = Tables.lineitem(spark, sf)
      .agg(sum(floor(col("l_tax") * 100 + lit(0.50001)).cast("long")) / 100.0)
      .as[Double].head()
    assert(out("l_tax") == direct)
  }

  test("gap-fill: calendar is dense per key, gaps carry the last value forward") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val daily = Seq(
      ("a", d("2024-01-01"), 10.0),
      ("a", d("2024-01-04"), 40.0), // 2 missing days
      ("b", d("2024-03-01"), 7.0)   // single-day key -> no gaps
    ).toDF("st", "day", "total")
    val out = graft.operators.GapFill.forwardFillDaily(daily, "st", "day", "total")
      .as[(String, java.sql.Date, Double, Boolean)].collect()
      .map(r => (r._1, r._2.toString) -> ((r._3, r._4))).toMap
    assert(out.size == 5)
    assert(out(("a", "2024-01-02")) == ((10.0, true)))  // carried + flagged
    assert(out(("a", "2024-01-03")) == ((10.0, true)))
    assert(out(("a", "2024-01-04")) == ((40.0, false)))
    assert(out(("b", "2024-03-01")) == ((7.0, false)))
  }

  test("pagerank: hand-checked 3-node graph, mass conservation without dangling leak") {
    // a -> b, a -> c, b -> c ; c dangling
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val pr = graft.operators.PageRank.run(edges, damping = 0.85, iters = 2)
      .as[(Long, Double)].collect().toMap
    // hand-rolled same recurrence
    var r = Map(1L -> 1.0 / 3, 2L -> 1.0 / 3, 3L -> 1.0 / 3)
    for (_ <- 1 to 2) {
      val base = 0.15 / 3
      r = Map(
        1L -> base,
        2L -> (base + 0.85 * r(1L) / 2),
        3L -> (base + 0.85 * (r(1L) / 2 + r(2L) / 1)))
    }
    assert(pr.keySet == r.keySet)
    r.foreach { case (k, v) => assert(math.abs(pr(k) - v) < 1e-12, s"node $k") }
    // ranks ordered by in-link weight: c > b > a
    assert(pr(3L) > pr(2L) && pr(2L) > pr(1L))
  }

  test("q78 islands: consecutive same-type runs collapse to intervals with correct bounds") {
    val out = EngineQueries.defs("q78_scd_islands")(spark, sf)
    import org.apache.spark.sql.functions.{col, sum => fsum}
    // per user: exactly one current interval; intervals tile without overlap
    val byUser = out.groupBy("user_id")
      .agg(
        fsum(col("is_current").cast("int")).as("n_current"),
        fsum(col("n_events")).as("n_events"))
      .as[(Long, Long, Long)].collect()
    assert(byUser.forall(_._2 == 1), "each user has exactly one open interval")
    val totalEvents = graft.Tables.events(spark, sf).count()
    assert(byUser.map(_._3).sum == totalEvents, "every event belongs to exactly one run")
    // adjacent intervals chain: valid_to of run k == valid_from of run k+1
    val chains = out.orderBy("user_id", "run")
      .select("user_id", "run", "valid_from_s", "valid_to_s")
      .as[(Long, Long, Long, Option[Long])].collect()
    chains.sliding(2).foreach {
      case Array(a, b) if a._1 == b._1 =>
        assert(a._4.contains(b._3), s"user ${a._1} run ${a._2} gap")
      case _ =>
    }
  }

  test("q79 funnel: stage timestamps are strictly ordered when present") {
    val rows = EngineQueries.defs("q79_funnel")(spark, sf)
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, t1, t2, t3) =>
      for (a <- t1; b <- t2) assert(b > a, s"user $u: click not after signup")
      for (b <- t2; c <- t3) assert(c > b, s"user $u: purchase not after click")
      if (t2.isDefined) assert(t1.isDefined)
      if (t3.isDefined) assert(t2.isDefined)
    }
    assert(rows.exists(_._3.isDefined), "someone completes the funnel")
  }

  test("q66 window family: pr/cd bounds and lag/lead adjacency") {
    val rows = EngineQueries.defs("q66_window_suite")(spark, sf)
      .filter($"o_orderstatus" === "F")
      .orderBy($"pr")
      .as[(Long, String, Int, Double, Double, Option[Long], Option[Long])]
      .collect()
    assert(rows.head._4 == 0.0)                  // first percent_rank = 0
    assert(rows.last._5 == 1.0)                  // last cume_dist = 1
    assert(rows.head._6.isEmpty && rows.last._7.isEmpty) // lag/lead edges
    // lead of row i == key of row i+1 under the same order
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._7.contains(b._1) && b._6.contains(a._1))
      case _ =>
    }
    assert(rows.map(_._3).distinct.sorted.sameElements(Array(1, 2, 3, 4)))
  }
}
