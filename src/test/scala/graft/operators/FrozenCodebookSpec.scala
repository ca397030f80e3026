package graft.operators

import graft.{SparkTestBase, Tables, TestClosure}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guards on the scale-keyed frozen blocking codebooks (r8 advice):
  *
  *  1. q50's oracle REPLAYS the blocking (same cells, same tie-break),
  *     so a candidate-generation bug would pass the hash oracle
  *     unnoticed. This spec restores one implementation-INDEPENDENT
  *     view: blocked components diffed against the exact union-find
  *     closure, with precision exact and recall floored.
  *
  *  2. The oracle's probe-cell ranking (ORDER BY s DESC, cpos) assumes
  *     DuckDB's list_sum accumulation and the native NearestCells loop
  *     agree bit-for-bit; ulp drift near the rank-4/5 boundary would
  *     flip a probe cell at some scale and break the hash silently.
  *     The margin test asserts no vector sits within 1e-9 of that
  *     boundary on any committed (corpus, book) pairing — an exact tie
  *     (margin 0) is also safe, both engines break it on cpos.
  */
class FrozenCodebookSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("q50 blocked components refine the exact closure at sf0.01 (independent cross-check)") {
    val d = "/root/testdata/sf0.01"
    val blocked = graft.SparkEntry.queries("q50_dedup_components")(spark, d)
      .as[(Long, Long)].collect().toMap
    val all = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }
    val exact = TestClosure.cosineComponents(all, tau = 0.4)
    // PRECISION is structural: every blocked edge is cosine-verified, so
    // two ids the blocked map groups together must share an exact
    // component — a violation means the candidate generator emitted a
    // pair the exact graph doesn't have (e.g. a broken cosine)
    for ((id, comp) <- blocked)
      assert(exact(id) == exact(comp),
        s"blocked groups $id with $comp but exact closure separates them")
    // RECALL: cell blocking must recover most of the exact non-singleton
    // membership (documented floor 0.6, same as SimilaritySpec's
    // survivor-level floor; CROSSOVER.json records 0.999 pair recall at
    // auto-K scale — the floor here is deliberately loose, the point is
    // an implementation-independent view, not a tight bound)
    val exactNonSingleton = exact.collect {
      case (id, c) if exact.count(_._2 == c) > 1 => id
    }.toSet
    val blockedGrouped = blocked.keySet
    val recall = (exactNonSingleton & blockedGrouped).size.toDouble /
      exactNonSingleton.size
    assert(recall >= 0.6, s"component membership recall $recall")
  }

  test("no vector within 1e-9 of a rank boundary the oracles depend on, any committed pairing") {
    // replay NearestCells' EXACT score arithmetic (sequential dot minus
    // half squared norm, j ascending) per (corpus generation, book).
    // TWO boundaries matter: rank-4/5 gates the rn <= 4 probe sets
    // (q50/q94/q131 probes), rank-1/2 gates q131's rn = 1 indexed-side
    // cell assignment — a near-tie at either flips a cell between
    // engines and silently breaks the hash at some corpus.
    def minMargins(d: String, k: Int): (Double, Double) = {
      val cents = graft.model.IvfCentroids.blockingCells(k)
      val vecs = Tables.embeddings(spark, d)
        .select(col("embedding")).as[Array[Float]].collect()
      var min45 = Double.MaxValue
      var min12 = Double.MaxValue
      for (v <- vecs) {
        val scores = cents.map { c =>
          var s = 0.0; var n = 0.0; var j = 0
          while (j < c.length) { s += v(j) * c(j); n += c(j) * c(j); j += 1 }
          s - n / 2
        }
        val sorted = scores.sorted(Ordering.Double.TotalOrdering.reverse)
        // exact ties (margin 0) fail too (r9 advice): a bitwise tie
        // under THIS accumulation order need not be a tie under
        // DuckDB's list_inner_product order, so cpos tie-breaking is
        // only safe when both engines see the tie. Ties are
        // measure-zero on these corpora — the stricter assert is free.
        val m45 = sorted(3) - sorted(4)
        if (m45 < min45) min45 = m45
        val m12 = sorted(0) - sorted(1)
        if (m12 < min12) min12 = m12
      }
      (min45, min12)
    }
    def check(d: String, k: Int, tag: String): Unit = {
      val (m45, m12) = minMargins(d, k)
      assert(m45 > 1e-9, s"$tag rank-4/5 margin $m45")
      assert(m12 > 1e-9, s"$tag rank-1/2 margin $m12")
    }
    check("/root/testdata/sf0.01", 40, "sf0.01/cells40")
    check("/root/testdata/sf0.1", 128, "sf0.1/cells128")
    // sf1 is the uncommitted builder-side upsample; check when present
    if (new java.io.File("/root/repo/tmp/testdata/sf1/embeddings.parquet").exists)
      check("/root/repo/tmp/testdata/sf1", 400, "sf1/cells400")
  }

  test("blockingK fails loudly past the trained ceiling instead of reusing the last book") {
    import graft.model.IvfCentroids
    // at and below the ceiling: the beyond-sf1 book (r10 verdict #5 —
    // trained by following the error message's recipe verbatim on the
    // 200k-row tmp/testdata/sf10 generation)
    assert(IvfCentroids.blockingK(IvfCentroids.blockingTrainedCeiling) == 1268)
    // the committed sf-generation gates are untouched by the new book
    assert(IvfCentroids.blockingK(200) == 40)
    assert(IvfCentroids.blockingK(2000) == 128)
    assert(IvfCentroids.blockingK(20000) == 400)
    // beyond it: refuse with the trainer recipe (r9 verdict #3 — a new
    // corpus generation must train its own book, never quietly resume
    // N²/K candidate growth on the last one)
    val e = intercept[IllegalStateException] {
      IvfCentroids.blockingK(IvfCentroids.blockingTrainedCeiling + 1)
    }
    assert(e.getMessage.contains("IvfCentroidsTrainer"))
    assert(e.getMessage.contains("blockingGates"))
  }

  test("the trainer-produced 1268-cell book loads through the same gate (r10 verdict #5)") {
    import graft.model.IvfCentroids
    // the gate the 200k generation maps to is the new book...
    val k = IvfCentroids.blockingK(200000)
    assert(k == 1268, "K must equal the production auto-K 4*ceil(sqrt(200000/2))")
    assert(k == 4 * math.ceil(math.sqrt(200000.0 / 2)).toInt)
    // ...and the committed fixture behind it has the right shape and
    // finite, non-degenerate centroids
    val book = IvfCentroids.blockingCells(k)
    assert(book.length == 1268)
    assert(book.forall(_.length == 64))
    assert(book.forall(_.forall(x => !x.isNaN && !x.isInfinite)))
    assert(book.map(_.toSeq).distinct.length == book.length,
      "duplicate centroids — Lloyd's collapsed cells")
    // the oracle deliberately does not replay this book (no committed
    // harness corpus at that generation); the SQL must keep carrying
    // the three replayed arms and nothing else
    val sql = IvfCentroids.blockingCentSql
    assert(sql.contains("<= 60000") && !sql.contains("<= 600000"))
    assert("UNION ALL".r.findAllIn(sql).length == 2,
      "oracle must carry exactly the three replayed arms")
  }
}
