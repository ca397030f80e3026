package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}
import org.scalatest.funsuite.AnyFunSuite

class EntityQueriesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def lev(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  test("q114: blocked best-match equals an independent in-memory linkage replay") {
    import spark.implicits._
    val parts = Tables.part(spark, sf)
      .selectExpr("p_name || ' ' || p_type AS descr")
      .as[String].collect()
    val dict = parts.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val blocks = dict.keys.toSeq
      .flatMap(s => s.split(" ").map(_ -> s))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .filter(_._2.size <= 64)
    val cand = blocks.values.flatMap { ds =>
      for (a <- ds; b <- ds if a != b) yield (a, b)
    }.toSet
    val want = cand.toSeq
      .map { case (a, b) => (a, b, lev(a, b)) }
      .filter(_._3 <= 10)
      .groupBy(_._1).view.mapValues { ms =>
        val best = ms.minBy(m => (m._3, m._2))
        (best._2, best._3, dict(best._1))
      }.toMap
    val got = SparkEntry.queries("q114_entity_match")(spark, sf)
      .as[(String, String, Int, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got == want)
    assert(want.nonEmpty, "no matches under the threshold — test is vacuous")
  }

  test("df-capped blocking: generic tokens generate no candidate pairs") {
    import spark.implicits._
    // 70 descriptors share only the generic token (df 72 > cap) and must
    // stay unmatched; one pair additionally shares a rare token and must
    // match through it despite the capped generic token
    val generic = (1 to 70).map(i => s"common u$i")
    val rare = Seq("common alpha one", "common alpha two")
    val dict = (generic ++ rare).toDF("descr")
      .groupBy("descr").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_parts"))
    val got = EntityQueries.bestMatches(dict, maxBlock = 64, maxDist = 10)
      .as[(String, String, Int, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("common alpha one", "common alpha two", 3, 1L),
      ("common alpha two", "common alpha one", 3, 1L)))
  }
}
