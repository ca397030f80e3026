package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MisraGriesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def hh(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(MisraGries.heavyHitters(col("t"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.cnt"))
      .as[(String, Long)].collect().toMap

  test("capacity >= cardinality: counts are exact across partial/final merge") {
    // 4 shuffle partitions in the test session force real partial buffers
    val data = (1 to 5000).map(i => s"term${i % 7}").toDF("t")
      .repartition(8)
    val exact = (0 until 7).map(i =>
      s"term$i" -> (1 to 5000).count(_ % 7 == i).toLong).toMap
    assert(hh(data, 64) == exact)
  }

  test("capacity < cardinality: undercount bounded by n/(k+1), heavy terms survive") {
    // one dominant term + a long tail of singletons
    val heavy = Seq.fill(3000)("HEAVY")
    val tail = (1 to 2000).map(i => s"t$i")
    val rnd = new scala.util.Random(7)
    val n = heavy.length + tail.length
    val k = 9
    val data = rnd.shuffle(heavy ++ tail).toDF("t").repartition(8)
    val got = hh(data, k)
    assert(got.size <= k)
    // merge bound: cumulative subtraction across P partial summaries plus
    // in-partition decrements stays within (P+1) * n/(k+1) worst case;
    // with n=5000, k=9 the dominant term (3000) must survive easily
    assert(got.contains("HEAVY"))
    assert(got("HEAVY") <= 3000) // never overcounts
    assert(got("HEAVY") >= 3000 - 9 * n / (k + 1), s"undercut too deep: ${got("HEAVY")}")
    got.foreach { case (t, c) =>
      val truth = if (t == "HEAVY") 3000L else 1L
      assert(c <= truth, s"$t overcounted: $c > $truth")
    }
  }

  test("nulls are skipped, empty input yields empty summary") {
    val data = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("t")
    assert(hh(data, 4) == Map("a" -> 2L, "b" -> 1L))
    val empty = spark.emptyDataset[String].toDF("t")
    assert(hh(empty, 4).isEmpty)
  }
}
