package graft.functions

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class AhoMatchesSpec extends AnyFunSuite with SparkTestBase {

  private def brute(text: String, patterns: Seq[String]): Seq[String] =
    patterns.distinct.sorted.filter(text.contains)

  test("aho_matches equals brute-force contains on adversarial cases") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // overlap, nesting, shared prefixes/suffixes, repeats, empty text
    val patterns = Seq("aba", "ab", "ba", "abab", "x", "zzz", "table table")
    val texts = Seq(
      "ababa",           // overlapping aba twice, abab once
      "ab",
      "ba",
      "",
      "xxxx",
      "table table table", // overlapping two-word phrase
      "ztable tablez",
      "abzba",
      "zzzz",
      "the quick brown fox")
    val got = texts.toDF("t")
      .select(col("t"), AhoMatches.toCol(col("t"), patterns).as("m"))
      .as[(String, Seq[String])].collect().toMap
    texts.foreach { t =>
      assert(got(t) == brute(t, patterns), s"text '$t'")
    }
  }

  test("aho_matches equals brute-force contains on random strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    def randStr(n: Int) = (1 to n).map(_ => alphabet(rnd.nextInt(3))).mkString
    val patterns = (1 to 12).map(_ => randStr(1 + rnd.nextInt(4))).distinct
    val texts = (1 to 200).map(_ => randStr(rnd.nextInt(40)))
    val got = texts.distinct.toDF("t")
      .select(col("t"), AhoMatches.toCol(col("t"), patterns).as("m"))
      .as[(String, Seq[String])].collect().toMap
    texts.distinct.foreach { t =>
      assert(got(t) == brute(t, patterns), s"text '$t' patterns $patterns")
    }
  }

  test("non-ASCII patterns and text match exactly (UTF-16 walk)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val patterns = Seq("héllo", "hél", "日本語", "本語テ", "emoji 😀 pair")
    val texts = Seq("say héllo", "日本語テキスト", "an emoji 😀 pair here", "hello")
    val got = texts.toDF("t")
      .select(col("t"), AhoMatches.toCol(col("t"), patterns).as("m"))
      .as[(String, Seq[String])].collect().toMap
    texts.foreach(t => assert(got(t) == brute(t, patterns), s"text '$t'"))
  }
}
