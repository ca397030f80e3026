package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit + property tests for the greedy allocator (SURVEY.md §2.8 edge
  * cases: exact stock, release-after-cancel, unknown key, null quantity)
  * and its invariants (Σ filled ≤ capacity; cancelled ⇒ alloc 0).
  */
class AllocationSpec extends AnyFunSuite with SparkTestBase {

  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.{Row, types => T}

  private val schema = T.StructType(Seq(
    T.StructField("key", T.IntegerType),
    T.StructField("seq", T.IntegerType),
    T.StructField("qty", T.DoubleType),
    T.StructField("cap", T.DoubleType)))

  private def run(rows: Seq[(Int, Int, java.lang.Double, Double)]): Map[(Int, Int), Double] = {
    val df = spark.createDataFrame(
      rows.map { case (k, s, q, c) => Row(k, s, q, c) }.asJava, schema)
    Allocation
      .greedy(df, "key", "qty", "cap", Seq("seq"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(4))
      .toMap
  }

  test("fills greedily in order, no partial fill") {
    val out = run(Seq((1, 1, 4.0, 5.0), (1, 2, 3.0, 5.0), (1, 3, 2.0, 5.0)))
    assert(out((1, 1)) == 4.0)
    assert(out((1, 2)) == 0.0) // 3 > remaining 1
    assert(out((1, 3)) == 0.0) // 2 > remaining 1
  }

  test("release-after-cancel: a cancelled line's qty stays available") {
    val out = run(Seq((1, 1, 4.0, 5.0), (1, 2, 3.0, 5.0), (1, 3, 1.0, 5.0)))
    assert(out((1, 1)) == 4.0)
    assert(out((1, 2)) == 0.0)
    assert(out((1, 3)) == 1.0) // greedy fills; cumsum-threshold would cancel
  }

  test("exact stock consumes to zero") {
    val out = run(Seq((1, 1, 5.0, 5.0), (1, 2, 1.0, 5.0)))
    assert(out((1, 1)) == 5.0 && out((1, 2)) == 0.0)
  }

  test("keys are independent") {
    val out = run(Seq((1, 1, 5.0, 5.0), (2, 1, 7.0, 10.0), (2, 2, 3.0, 10.0)))
    assert(out((1, 1)) == 5.0 && out((2, 1)) == 7.0 && out((2, 2)) == 3.0)
  }

  test("null capacity ⇒ nothing fills; null/zero qty ⇒ alloc 0") {
    import org.apache.spark.sql.Row
    val df = spark.createDataFrame(
      Seq(Row(1, 1, 2.0, null), Row(2, 1, null, 5.0), Row(2, 2, 0.0, 5.0)).asJava,
      schema)
    val out = Allocation.greedy(df, "key", "qty", "cap", Seq("seq"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(4)).toMap
    assert(out((1, 1)) == 0.0 && out((2, 1)) == 0.0 && out((2, 2)) == 0.0)
  }

  test("cumulativeThreshold differs from greedy exactly on release-after-cancel") {
    val rows = Seq((1, 1, 4.0, 5.0), (1, 2, 3.0, 5.0), (1, 3, 1.0, 5.0))
    val df = spark.createDataFrame(
      rows.map { case (k, s, q, c) => Row(k, s, java.lang.Double.valueOf(q), c) }.asJava, schema)
    val cum = Allocation.cumulativeThreshold(df, "key", "qty", "cap", Seq("seq"))
      .collect().map(r => r.getInt(1) -> r.getDouble(4)).toMap
    assert(cum(1) == 4.0 && cum(2) == 0.0 && cum(3) == 0.0)
  }

  test("property: Σ filled ≤ cap per key; alloc ∈ {0, qty}; matches driver fold") {
    val rnd = new scala.util.Random(42) // deterministic
    for (_ <- 1 to 25) {
      val nKeys = 1 + rnd.nextInt(5)
      val lines = (0 until 40).map { i =>
        (1 + rnd.nextInt(nKeys), i, rnd.nextInt(11).toDouble, 20.0)
      }
      val rows = lines.map { case (k, s, q, c) => (k, s, java.lang.Double.valueOf(q), c) }
      val out = run(rows)
      lines.groupBy(_._1).foreach { case (k, ls) =>
        val filled = ls.map(l => out((k, l._2))).sum
        assert(filled <= 20.0 + 1e-9, s"key $k overfilled: $filled")
        ls.foreach { l =>
          val a = out((k, l._2))
          assert(a == 0.0 || a == l._3, s"partial fill: $a vs ${l._3}")
        }
        // greedy reference fold on the driver must agree
        var rem = 20.0
        ls.sortBy(_._2).foreach { l =>
          val expect = if (l._3 > 0 && l._3 <= rem) { rem -= l._3; l._3 } else 0.0
          assert(out((k, l._2)) == expect)
        }
      }
    }
  }

  test("remainingCapacity: cap − Σ filled, untouched keys keep cap") {
    import spark.implicits._
    val caps = Seq((1, 10.0), (2, 7.0), (3, 4.0)).toDF("key", "cap")
    val alloc = Seq((1, 6.0), (1, 2.0), (2, 7.0)).toDF("key", "alloc_qty")
    val out = Allocation.remainingCapacity(caps, alloc, "key", "cap")
      .select("key", "remaining_cap").as[(Int, Double)].collect().toMap
    assert(out == Map(1 -> 2.0, 2 -> 0.0, 3 -> 4.0))
  }
}
