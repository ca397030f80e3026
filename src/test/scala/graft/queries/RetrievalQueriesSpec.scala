package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.scalatest.funsuite.AnyFunSuite

/** The retrieval queries are hash-checked against DuckDB oracles; this
  * spec pins the semantic invariants a hash can't express on its own.
  */
class RetrievalQueriesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q101: ranks are dense, scores non-increasing, hits contain a query term") {
    import spark.implicits._
    val rows = SparkEntry.queries("q101_bm25_topk")(spark, sf)
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    assert(rows.map(_._3).toSeq == (1 to rows.length))
    assert(rows.sliding(2).forall {
      case Array(a, b) => a._2 >= b._2
      case _ => true
    })
    val terms = Set("spark", "merge", "window")
    val texts = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toMap
    rows.foreach { case (id, score, _) =>
      assert(score > 0)
      assert(texts(id).split(" ").exists(terms), s"doc $id has no query term")
    }
  }

  test("q102: postings are doc-ordered and df/total_tf agree with the list") {
    import spark.implicits._
    val rows = SparkEntry.queries("q102_inverted_index")(spark, sf)
      .as[(String, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (token, df, totalTf, postings) =>
      val entries = postings.split(",").map { e =>
        val Array(id, tf) = e.split(":"); (id.toLong, tf.toLong)
      }
      assert(entries.length.toLong == df, s"$token: df != postings length")
      assert(entries.map(_._2).sum == totalTf, s"$token: total_tf mismatch")
      assert(entries.map(_._1).toSeq == entries.map(_._1).sorted.toSeq,
        s"$token: postings not doc-ordered")
    }
  }
}
