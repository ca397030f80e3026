package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}
import org.scalatest.funsuite.AnyFunSuite

class WarehouseQueriesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q112: bounded top-k aggregate equals the window row_number formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = Tables.orders(spark, sf)
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 3)
      .select(col("o_orderpriority"), col("rank"), col("o_orderkey"), col("o_totalprice"))
    val agg = SparkEntry.queries("q112_topk_agg")(spark, sf)
    assert(agg.exceptAll(windowed).isEmpty && windowed.exceptAll(agg).isEmpty)
  }

  test("bounded top-k is input-order invariant and survives partial/merge paths") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (1L to 1000L).map(i => (i % 7, i, (i * 2654435761L % 1000).toDouble))
    // identical ord values on purpose: ties must break toward smaller key
    val ties = Seq((0L, 2000L, 999999.0), (0L, 1999L, 999999.0), (0L, 2001L, 999999.0))
    val base = (rows ++ ties).toDF("g", "k", "v")
    val expected = (rows ++ ties).groupBy(_._1).view.mapValues { vs =>
      vs.sortBy { case (_, k, v) => (-v, k) }.take(5).map(t => (t._2, t._3))
    }.toMap
    Seq(1, 3, 16).foreach { parts =>
      val got = base.repartition(parts, col("k"))
        .groupBy(col("g"))
        .agg(graft.functions.BoundedTopK.topKBy(col("k"), col("v"), 5).as("top"))
        .select(col("g"), col("top"))
        .as[(Long, Seq[(Long, Double)])].collect().toMap
      assert(got.keySet == expected.keySet)
      got.foreach { case (g, top) =>
        assert(top == expected(g).toSeq, s"group $g at $parts partitions")
      }
    }
  }

  test("q111: SCD2 apply matches an independent event replay") {
    import spark.implicits._
    val cutoffMicros =
      java.time.LocalDate.parse("2024-01-25").atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli * 1000L
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS tsu", "event_id")
      .as[(Long, String, Long, Long)].collect()
    // replay: per user, runs of equal type before the cutoff → intervals;
    // latest batch event at/after the cutoff upserts the current row
    val want = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Option[Long], Boolean)]
    val byUser = ev.groupBy(_._1)
    val batchUsers = scala.collection.mutable.Set.empty[Long]
    byUser.foreach { case (user, rows) =>
      val past = rows.filter(_._3 < cutoffMicros).sortBy(r => (r._3, r._4))
      val batch = rows.filter(_._3 >= cutoffMicros).sortBy(r => (-r._3, -r._4)).headOption
      batch.foreach(_ => batchUsers += user)
      // collapse runs
      val runs = scala.collection.mutable.ArrayBuffer.empty[(String, Long)] // (type, from)
      past.foreach { r =>
        if (runs.isEmpty || runs.last._1 != r._2) runs += ((r._2, r._3))
      }
      val intervals = runs.zipWithIndex.map { case ((t, from), i) =>
        val to = if (i + 1 < runs.length) Some(runs(i + 1)._2) else None
        (t, from, to)
      }
      intervals.dropRight(1).foreach { case (t, from, to) =>
        want += ((user, t, from, to, false))
      }
      val cur = intervals.lastOption
      (cur, batch) match {
        case (Some((t, from, _)), Some(b)) if b._2 != t =>
          want += ((user, t, from, Some(b._3), false))
          want += ((user, b._2, b._3, None, true))
        case (Some((t, from, _)), _) =>
          want += ((user, t, from, None, true))
        case (None, Some(b)) =>
          want += ((user, b._2, b._3, None, true))
        case (None, None) =>
      }
    }
    val got = SparkEntry.queries("q111_scd2_apply")(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(valid_from)",
        "unix_micros(valid_to)", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect()
    assert(got.sorted.toSeq == want.sorted.toSeq)
    // shape invariants: exactly one current row per user with any history
    val curPerUser = got.filter(_._5).groupBy(_._1).view.mapValues(_.length)
    assert(curPerUser.values.forall(_ == 1))
    assert(got.count(_._5) == byUser.size, "every user ends with one current row")
    assert(batchUsers.nonEmpty, "no batch users in fixture — test is vacuous")
  }

  test("q113: point-in-time join matches a per-event linear history probe") {
    import spark.implicits._
    val cutoffMicros =
      java.time.LocalDate.parse("2024-01-25").atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli * 1000L
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS tsu", "event_id")
      .as[(Long, String, Long, Long)].collect()
    // replay: per user, run-collapse the pre-cutoff stream into versions,
    // then probe each post-cutoff event with valid_from <= ts < valid_to
    val want = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Option[String])]
    ev.groupBy(_._1).foreach { case (user, rows) =>
      val past = rows.filter(_._3 < cutoffMicros).sortBy(r => (r._3, r._4))
      val runs = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      past.foreach { r =>
        if (runs.isEmpty || runs.last._1 != r._2) runs += ((r._2, r._3))
      }
      rows.filter(_._3 >= cutoffMicros).foreach { e =>
        val at = runs.zipWithIndex.find { case ((_, from), i) =>
          val to = if (i + 1 < runs.length) Some(runs(i + 1)._2) else None
          e._3 >= from && to.forall(e._3 < _)
        }.map(_._1._1)
        want += ((user, e._4, e._3, at))
      }
    }
    val got = SparkEntry.queries("q113_pit_join")(spark, sf)
      .selectExpr("user_id", "event_id", "unix_micros(ts)", "type_at")
      .as[(Long, Long, Long, Option[String])].collect()
    assert(got.sorted.toSeq == want.sortBy(t => (t._1, t._2, t._3)).toSeq)
    assert(want.exists(_._4.nonEmpty), "no enriched events — test is vacuous")
  }

  test("q115: incremental merge equals a full signed recompute") {
    import spark.implicits._
    val cutMicros =
      java.time.LocalDate.parse("2000-06-01").atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli * 1000L
    val rows = Tables.lineitem(spark, sf)
      .selectExpr("l_partkey", "l_quantity", "l_returnflag",
        "unix_micros(CAST(l_shipdate AS TIMESTAMP))")
      .as[(Long, Double, String, Long)].collect()
    val want = rows.groupBy(_._1).view.mapValues { vs =>
      val signed = vs.map { case (_, q, rf, ship) =>
        if (ship >= cutMicros && rf == "R") (-q, -1L) else (q, 1L)
      }
      (signed.map(_._1).sum, signed.map(_._2).sum)
    }.filter(_._2._2 > 0).toMap
    val got = SparkEntry.queries("q115_ivm_merge")(spark, sf)
      .as[(Long, Double, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == want)
    assert(rows.exists(r => r._4 >= cutMicros && r._3 == "R"),
      "no retractions in fixture — test is vacuous")
  }
}
