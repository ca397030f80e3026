package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {

  test("builder wires tuned defaults and the SQL extension functions") {
    // getOrCreate returns any active session, which would bypass the
    // extensions — clear first, restore after, so the shared test
    // session is unaffected for other suites.
    val prior = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = GraftSession.builder(master = "local[2]", shufflePartitions = 2)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "2")
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "64MB")
      // all custom functions resolve through pure SQL (extensions path)
      val row = spark.sql(
        """SELECT simhash64('a b') AS s,
          |size(minhash_sig('abcdef', 8, 3)) AS m,
          |ngram_jaccard('abc', 'abc', 2) AS j,
          |lang_id('the of and') AS l,
          |cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c,
          |word_ngrams('a b a b', 2, true) AS w,
          |word_chunks('a b c', 2, 2) AS ch,
          |normalize_text('  A  B ') AS nt,
          |cms_estimate(count_min_sketch(CAST(7 AS BIGINT), 0.001d, 0.99d, 1), CAST(7 AS BIGINT)) AS ce""".stripMargin)
        .collect()(0)
      assert(row.getInt(1) == 8)
      assert(row.getDouble(2) == 1.0)
      assert(row.getString(3) == "en")
      assert(row.getDouble(4) == 0.0)
      assert(row.getSeq[String](5) == Seq("a b", "b a"))
      assert(row.getSeq[String](6) == Seq("a b", "c"))
      assert(row.getString(7) == "a b")
      assert(row.getLong(8) == 1L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach { s =>
        SparkSession.setActiveSession(s)
        SparkSession.setDefaultSession(s)
      }
    }
  }
}
