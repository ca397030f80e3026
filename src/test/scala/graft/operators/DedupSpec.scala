package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the fence nearby"

  private lazy val docs = Seq(
    (1L, base),
    (2L, base), // exact dup of 1
    (3L, base.replace("lazy", "hazy")), // near dup of 1
    (4L, "completely different content about spark query engines and shuffles"),
    (5L, "another unrelated document mentioning neither foxes nor dogs at all")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, survivor = min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 2L))) // docs 1+2 collapse, survivor 1
    assert(out.count(_._2 == 1L) == 3)
  }

  test("minhash LSH finds exact and near dup pairs, not unrelated ones") {
    val pairs = Dedup
      .minHashCandidates(docs, "doc_id", "text", numHashes = 64, bands = 32, shingleSize = 5)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("jaccardVerify: identical ⇒ 1.0; near-dup high; threshold filters") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.jaccardVerify(docs, pairs, "doc_id", "text", 5, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out((1L, 3L)) > 0.8 && out((1L, 3L)) < 1.0)
    assert(!out.contains((1L, 4L))) // below threshold
  }

  test("minhash signature is deterministic and length numHashes") {
    graft.functions.MinHashSig.register(spark)
    val s1 = docs.select(Dedup.minHashSignature("text", 16, 5).as("sig"))
      .as[Seq[Long]].collect()
    val s2 = docs.select(Dedup.minHashSignature("text", 16, 5).as("sig"))
      .as[Seq[Long]].collect()
    assert(s1.toSeq == s2.toSeq)
    assert(s1.forall(_.length == 16))
  }

  test("maxBucket drops oversized buckets instead of exploding quadratically") {
    val many = (1L to 50L).map(i => (i, base)).toDF("doc_id", "text")
    val capped = Dedup.minHashCandidates(
      many, "doc_id", "text", numHashes = 64, bands = 16, shingleSize = 5,
      maxBucket = 10)
    assert(capped.count() == 0) // bucket of 50 identical docs > cap ⇒ dropped
  }
}
