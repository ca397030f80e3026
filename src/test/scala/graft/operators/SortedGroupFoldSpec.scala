package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}
import org.scalatest.funsuite.AnyFunSuite

/** Group-key equality semantics of the sorted-fold skeleton. The r12
  * ADVICE scenario: binary group keys (e.g. 16-byte digests) arrive in
  * `Row.get` as `Array[Byte]`, whose `==` is REFERENCE equality — the
  * fold must compare by content (`Objects.deepEquals`) or every
  * binary-keyed row silently becomes its own group.
  */
class SortedGroupFoldSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("reduceGroups merges binary (Array[Byte]) group keys by content") {
    // 3 distinct digests x several rows each
    val df = Seq(
      ("a", 1L), ("b", 2L), ("a", 3L), ("c", 4L), ("b", 5L), ("a", 6L)
    ).toDF("k", "v").select(md5(col("k")).cast("binary").as("g"), col("v"))
    val vi = 1
    val out = SortedGroupFold.reduceGroups(
      df, "g", Seq("v"),
      Seq(StructField("sum_v", LongType, nullable = false),
        StructField("n", LongType, nullable = false))) {
      () => new SortedGroupFold.GroupReducer {
        private var s = 0L; private var n = 0L
        def start(r: Row): Unit = { s = 0L; n = 0L }
        def next(r: Row): Unit = { s += r.getLong(vi); n += 1L }
        def finish(): Seq[Any] = Seq(s, n)
      }
    }
    val got = out.select(hex(col("g")), col("sum_v"), col("n"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 3, s"expected 3 digest groups, got ${got.toSeq}")
    assert(got.map(_._2).sum == 21L && got.map(_._3).toSet == Set(3L, 2L, 1L))
  }

  test("appendColumn detects group changes on binary keys by content") {
    val df = Seq(("a", 1L), ("b", 2L), ("a", 3L), ("b", 4L), ("a", 5L))
      .toDF("k", "v").select(md5(col("k")).cast("binary").as("g"), col("v"))
    val vi = 1
    val out = SortedGroupFold.appendColumn(df, "g", Seq("v"), "rank", LongType) {
      () => new SortedGroupFold.Fold {
        private var i = 0L
        def start(r: Row): Unit = i = 0L
        def next(r: Row): Any = { i += 1L; i }
      }
    }
    val got = out.select(col("v"), col("rank")).as[(Long, Long)]
      .collect().toMap
    // per-group ranks restart: a-group (1,3,5) → 1,2,3; b-group (2,4) → 1,2
    assert(got == Map(1L -> 1L, 3L -> 2L, 5L -> 3L, 2L -> 1L, 4L -> 2L))
  }
}
