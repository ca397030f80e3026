package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class UrlOpsSpec extends AnyFunSuite with SparkTestBase {

  private def canon(urls: String*): Seq[(String, String)] = {
    import spark.implicits._
    urls.toDF("raw")
      .select(
        UrlOps.canonicalHost(col("raw")).as("host"),
        UrlOps.canonicalUrl(col("raw")).as("canon"))
      .as[(String, String)].collect().toSeq
  }

  test("scheme/case/port/www/fragment/trailing-slash variants collapse") {
    val variants = Seq(
      "http://Example.COM/a/b",
      "https://example.com/a/b",
      "https://www.example.com:443/a/b",
      "http://example.com/a/b/",
      "https://EXAMPLE.com/a/b#frag",
      "http://www.example.com:8080/a/b?utm_source=x&utm_medium=y")
    val out = canon(variants: _*)
    assert(out.map(_._1).distinct == Seq("example.com"))
    assert(out.map(_._2).distinct == Seq("example.com/a/b"))
  }

  test("real query params survive in order; tracking params are dropped") {
    val out = canon(
      "https://h.org/search?utm_source=feed&q=spark&page=2&ref=sidebar",
      "https://h.org/search?q=spark&page=2")
    assert(out.map(_._2).distinct == Seq("h.org/search?q=spark&page=2"))
  }

  test("root path and distinct resources stay distinct") {
    val out = canon(
      "https://h.org",
      "https://h.org/",
      "https://h.org/x",
      "https://h.org/y")
    assert(out.map(_._2) == Seq("h.org/", "h.org/", "h.org/x", "h.org/y"))
  }
}
