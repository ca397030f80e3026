package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** The curation queries are hash-checked against DuckDB oracles at the
  * driver; this spec replays each one with an INDEPENDENT in-memory
  * implementation (plain Scala collections, no Spark expressions shared
  * with the query) so a bug mirrored into the oracle SQL can't hide.
  */
class CurationQueriesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q105: span dedup matches an independent replay, span for span") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    // independent replay: first global occurrence wins, (doc_id, span_idx) order
    val seen = scala.collection.mutable.Set.empty[String]
    val want = docs.map { case (id, text) =>
      val words = text.split(" ").filter(_.nonEmpty)
      val spans = words.grouped(10).map(_.mkString(" ")).toVector
      val kept = spans.filter(seen.add) // add returns false on duplicates
      id -> ((spans.length.toLong, (spans.length - kept.length).toLong,
        kept.mkString(" ")))
    }.toMap
    val got = SparkEntry.queries("q105_span_dedup")(spark, sf)
      .as[(Long, Long, Long, String)].collect()
    assert(got.length == want.size)
    got.foreach { case (id, nSpans, nRemoved, text) =>
      val (wSpans, wRemoved, wText) = want(id)
      assert(nSpans == wSpans, s"doc $id span count")
      assert(nRemoved == wRemoved, s"doc $id removed count")
      assert(text == wText, s"doc $id reassembled text")
    }
    // the dedup actually removed something at this sf, or the test is vacuous
    assert(got.map(_._3).sum > 0, "no duplicate spans in fixture — test is vacuous")
  }

  test("q106: audit verdicts match independently computed violation counts") {
    import spark.implicits._
    val got = SparkEntry.queries("q106_quality_audit")(spark, sf)
      .as[(String, Double, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set(
      "orders_pk_unique", "orders_price_nonneg", "orders_status_domain",
      "lineitem_shipdate_nonnull", "lineitem_qty_range", "lineitem_fk_orders"))
    val orders = Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_totalprice", "o_orderstatus")
      .as[(Long, Double, String)].collect()
    val line = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_quantity", "CAST(l_shipdate AS STRING)")
      .as[(Long, Double, Option[String])].collect()
    def frac(viol: Long, n: Long): Double =
      math.floor(viol.toDouble / n * 1000000 + 0.50001) / 1000000
    val n = orders.length.toLong
    assert(got("orders_pk_unique")._1 ==
      frac(orders.map(_._1).distinct.length.toLong, n))
    assert(got("orders_pk_unique")._2 ==
      (orders.map(_._1).distinct.length == orders.length))
    assert(got("orders_price_nonneg")._1 == frac(orders.count(_._2 < 0).toLong, n))
    assert(got("orders_status_domain")._1 ==
      frac(orders.count(o => !Set("F", "O", "P")(o._3)).toLong, n))
    val ln = line.length.toLong
    assert(got("lineitem_shipdate_nonnull")._1 ==
      frac(line.count(_._3.isEmpty).toLong, ln))
    assert(got("lineitem_qty_range")._1 ==
      frac(line.count(l => l._2 < 1 || l._2 > 50).toLong, ln))
    val keys = orders.map(_._1).toSet
    assert(got("lineitem_fk_orders")._1 ==
      frac(line.count(l => !keys(l._1)).toLong, ln))
  }

  test("q107: median/MAD/outlier counts match an exact in-memory computation") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
      .selectExpr("event_type", "value").as[(String, Double)].collect()
    def interpMedian(xs: Array[Double]): Double = {
      val s = xs.sorted
      val idx = 0.5 * (s.length - 1)
      val lo = s(idx.toInt)
      val hi = s(math.ceil(idx).toInt)
      lo + (idx - idx.toInt) * (hi - lo) // percentile()'s linear interpolation
    }
    def r6(x: Double): Double = math.floor(x * 1000000 + 0.50001) / 1000000
    val want = events.groupBy(_._1).map { case (t, vs) =>
      val values = vs.map(_._2)
      val med = interpMedian(values)
      val adev = values.map(v => math.abs(v - med))
      val mad = interpMedian(adev)
      val outliers = adev.count(a => r6(a) > r6(3 * 1.4826 * mad)).toLong
      t -> ((values.length.toLong, r6(med), r6(mad), outliers))
    }
    val got = SparkEntry.queries("q107_anomaly_mad")(spark, sf)
      .as[(String, Long, Double, Double, Long)].collect()
    assert(got.length == want.size)
    got.foreach { case (t, n, med, mad, out) =>
      assert((n, med, mad, out) == want(t), s"event_type $t")
    }
  }

  test("q108: pair counts match an independent replay") {
    import spark.implicits._
    val words = Tables.documents(spark, sf)
      .selectExpr("text").as[String].collect()
      .flatMap(_.split(" ")).filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val counts = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        counts(p) = counts.getOrElse(p, 0L) + f
      }
    }
    val want = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(50)
      .zipWithIndex.map { case ((p, c), i) => (p, c, i + 1) }
    val got = SparkEntry.queries("q108_bpe_pairs")(spark, sf)
      .as[(String, Long, Int)].collect().sortBy(_._3)
    assert(got.toSeq == want)
  }
}
