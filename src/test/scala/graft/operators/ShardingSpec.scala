package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Token-balanced sharding over planted VARIABLE-length sequences — the
  * case q148's count-balance mishandles by construction.
  */
class ShardingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("token-balanced cuts match the in-memory prefix-sum replay and " +
    "bound every shard's mass by total/S + max size") {
    val rng = new scala.util.Random(41)
    val rows = (1L to 400L).map(i => (i, 1L + rng.nextInt(500).toLong))
    val df = rows.toDF("seq_id", "sz").repartition(7)
    val S = 8L
    val out = Sharding.tokenBalancedShards(df, "sz", Seq("seq_id"), S)
      .select($"shard", $"seq_id", $"sz", $"tok_start")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    // in-memory replay
    val total = rows.map(_._2).sum
    var run = 0L
    val expect = rows.sortBy(_._1).map { case (id, sz) =>
      val st = run; run += sz
      (st * S / total, id, sz, st)
    }
    assert(out.toSeq == expect)
    // shards are contiguous in the order and monotone
    assert(out.map(_._1).toSeq == out.map(_._1).sorted.toSeq)
    // balance: every shard's token mass < total/S + max single size
    val maxSz = rows.map(_._2).max
    val byShard = out.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    byShard.foreach { case (sh, m) =>
      assert(m < total / S + maxSz + 1, s"shard $sh mass $m")
    }
    // count-balance would NOT achieve this: the planted sizes vary 500×
    assert(rows.map(_._2).max >= 100 * rows.map(_._2).min)
  }

  test("a sequence longer than a whole shard budget leaves later shard " +
    "indices legitimately empty; totals still partition exactly") {
    val df = Seq((1L, 10L), (2L, 1000L), (3L, 10L)).toDF("seq_id", "sz")
    val out = Sharding.tokenBalancedShards(df, "sz", Seq("seq_id"), 4L)
      .select($"shard", $"seq_id").as[(Long, Long)].collect().sortBy(_._2)
    // offsets: 0, 10, 1010 of 1020 → shards 0, 0, 3 — the giant row ate
    // the budget of shards 0-3's middle range
    assert(out.toSeq == Seq((0L, 1L), (0L, 2L), (3L, 3L)))
  }

  test("null and negative sizes count zero; empty input yields no rows") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(-7L)), (4L, Some(5L)))
      .toDF("seq_id", "sz")
    val out = Sharding.tokenBalancedShards(df, "sz", Seq("seq_id"), 2L)
      .select($"shard", $"seq_id", $"tok_start")
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    assert(out.toSeq == Seq((0L, 1L, 0L), (1L, 2L, 5L), (1L, 3L, 5L), (1L, 4L, 5L)))
    assert(Sharding.tokenBalancedShards(
      Seq.empty[(Long, Long)].toDF("seq_id", "sz"), "sz", Seq("seq_id"), 3L)
      .count() == 0L)
  }
}
