package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("salted join == plain join on a skewed key distribution") {
    // 10k rows of hot key 1, a few of others
    val big = ((1 to 10000).map(_ => (1L, "hot")) ++
      (1 to 50).map(i => (i.toLong % 5 + 2, "cold"))).toDF("k", "tag")
    val small = Seq((1L, "A"), (2L, "B"), (3L, "C"), (9L, "unmatched")).toDF("k", "v")

    val plain = big.join(small, Seq("k"), "inner")
      .groupBy("k", "v").count().as[(Long, String, Long)].collect().toSet
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", saltFactor = 8)
      .groupBy("k", "v").count().as[(Long, String, Long)].collect().toSet
    assert(salted == plain)
    assert(plain.exists(_._3 == 10000L)) // the hot key survived intact
  }

  test("salt actually spreads the hot key across partitions") {
    val big = (1 to 5000).map(_ => (1L, "x")).toDF("k", "tag")
    val salted = big.withColumn(
      "__salt",
      pmod(xxhash64(col("k"), monotonically_increasing_id()), lit(8)))
    val saltCounts = salted.groupBy("__salt").count().as[(Long, Long)].collect()
    assert(saltCounts.length == 8)           // all 8 salt values used
    assert(saltCounts.forall(_._2 > 100))    // roughly uniform
  }
}
