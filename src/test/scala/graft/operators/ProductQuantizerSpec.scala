package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PQ codebook/encode/ADC checked for shape, determinism, plan, and —
  * independently of the DuckDB oracle — shortlist recall against a
  * driver-side exact L2 brute force.
  */
class ProductQuantizerSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.01"
  private def emb = Tables.embeddings(spark, sf)

  test("codebook: bounded, code-ascending, deterministic") {
    val cb = ProductQuantizer.trainCodebook(emb, "vec_id", "embedding", ks = 64)
    assert(cb.size <= 64)
    assert(cb.map(_._1) == cb.map(_._1).sorted)
    assert(cb.forall(_._2.length == 64))
    val cb2 = ProductQuantizer.trainCodebook(emb, "vec_id", "embedding", ks = 64)
    assert(cb == cb2)
  }

  test("encode: m codes per vector, all valid positions, shuffle-free plan") {
    val cb = ProductQuantizer.trainCodebook(emb, "vec_id", "embedding", ks = 64)
    val coded = ProductQuantizer.encode(emb, "vec_id", "embedding", cb, m = 16)
    val plan = coded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must be a pure map pass:\n$plan")
    val rows = coded.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == 16)
      assert(codes.forall(c => c >= 0 && c < cb.size))
    }
  }

  test("kernel properties on seeded random inputs (argmin optimality, ADC consistency, residual identities)") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val rnd = new scala.util.Random(12345)
    val dim = 16; val m = 4; val ks = 8
    for (_ <- 1 to 50) {
      val cents = Array.fill(ks)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
      val centsSeq = cents.map(_.toSeq).toSeq
      val v = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
      val codes = graft.functions.PqCodes.compute(v, cents, m).asInstanceOf[ArrayData]
      val lutV = graft.functions.PqLut.compute(v, cents, m).asInstanceOf[ArrayData]
      // argmin optimality: the chosen centroid's own-LUT entry is minimal
      // per subspace (first-wins ties → also the smallest such position)
      for (j <- 0 until m) {
        val row = lutV.getArray(j)
        val chosen = codes.getInt(j)
        val dists = (0 until ks).map(row.getDouble)
        assert(dists(chosen) == dists.min)
        assert(chosen == dists.indexOf(dists.min))
      }
      // ADC consistency: pq_adc over a query's LUT equals the sum of the
      // independently recomputed subspace distances to the chosen cells
      val q = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
      val lutQ = graft.functions.PqLut.compute(q, cents, m).asInstanceOf[ArrayData]
      val adc = graft.functions.PqAdc.compute(lutQ, codes)
      val sub = dim / m
      val expected = (0 until m).map { j =>
        val cv = cents(codes.getInt(j))
        (j * sub until (j + 1) * sub).map(i => (q(i) - cv(i)) * (q(i) - cv(i))).sum
      }.sum
      assert(math.abs(adc - expected) < 1e-12, s"adc=$adc expected=$expected")
      // residual identities: residual of a centroid against itself is
      // exactly zero; residual + centroid returns the input to 1 ulp-ish
      val cell = rnd.nextInt(ks)
      val rz = graft.functions.PqResidual.compute(cents(cell), cell, cents)
        .asInstanceOf[ArrayData].toDoubleArray()
      assert(rz.forall(_ == 0.0))
      val rv = graft.functions.PqResidual.compute(v, cell, cents)
        .asInstanceOf[ArrayData].toDoubleArray()
      for (i <- 0 until dim)
        assert(math.abs(rv(i) + cents(cell)(i) - v(i)) < 1e-12)
    }
  }

  test("codes stay in-range for NaN/overflow vectors (no -1 sentinel escape)") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val cents = Array(Array(0.0, 0.0), Array(1.0, 1.0))
    val nan = graft.functions.PqCodes
      .compute(Array(Double.NaN, 0.5), cents, 1)
      .asInstanceOf[ArrayData]
    assert(nan.getInt(0) == 0, "all-NaN distances must keep centroid 0")
    val inf = graft.functions.PqCodes
      .compute(Array(Double.MaxValue, Double.MaxValue), cents, 2)
      .asInstanceOf[ArrayData]
    assert(inf.getInt(0) >= 0 && inf.getInt(1) >= 0)
    // and pq_adc must therefore never see a negative index
    val lut = graft.functions.PqLut
      .compute(Array(Double.NaN, 0.5), cents, 1)
      .asInstanceOf[ArrayData]
    val adc = graft.functions.PqAdc.compute(lut, nan)
    assert(adc.isNaN, "NaN propagates through ADC rather than crashing")
  }

  test("ADC shortlist holds >=0.9 of the exact top-5; re-rank orders them exactly") {
    // driver-side exact L2 ground truth over the 500-vector corpus
    val all = emb.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val queries = all.filter(_._1 < 10)
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val exactTop5 = queries.map { case (qid, qv) =>
      qid -> all.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, sq(qv, nv)) }
        .sortBy { case (nid, d) => (d, nid) }.take(5)
    }.toMap

    val got = ProductQuantizer.adcRerankTopK(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, m = 16, ks = 64, shortlist = 50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))

    val byQuery = got.groupBy(_._1)
    assert(byQuery.size == 10)
    val hits = exactTop5.map { case (qid, top) =>
      top.count { case (nid, _) => byQuery(qid).exists(_._2 == nid) }
    }.sum
    val recall = hits.toDouble / 50
    assert(recall >= 0.9, s"shortlist recall@5 degraded: $recall")

    // IVF-PQ probes 6 of 16 cells: a strict subset of the corpus is
    // scanned, so recall drops — the nprobe dial. Floor from the measured
    // 0.68 at sf0.01 (deterministic: the fit has no randomness; fine
    // codebook trains on the md5-gated half-sample, the production shape).
    val ivf = ProductQuantizer.ivfPqTopK(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, cells = 16, nprobe = 6, m = 16, ks = 64, shortlist = 50)
    val ivfPlan = ivf.queryExecution.sparkPlan.toString
    assert(!ivfPlan.contains("BroadcastNestedLoopJoin") &&
      !ivfPlan.contains("CartesianProduct"),
      s"IVF ADC scan must be an equi-join on cell:\n$ivfPlan")
    val ivfBy = ivf.collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val ivfHits = exactTop5.map { case (qid, top) =>
      top.count { case (nid, _) => ivfBy(qid).exists(_._2 == nid) }
    }.sum
    assert(ivfHits.toDouble / 50 >= 0.65,
      s"IVF-PQ recall@5 degraded: ${ivfHits / 50.0}")

    // survivors must be ordered by true distance: every returned pair
    // (rank, l2) is ascending, and l2 matches the ground truth to 1e-6
    val vecById = all.toMap
    byQuery.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._3).sliding(2).forall(p => p.head <= p.last))
      sorted.foreach { case (_, nid, l2, _) =>
        val truth = sq(vecById(qid), vecById(nid))
        assert(math.abs(l2 - truth) < 2e-6, s"q$qid n$nid l2=$l2 truth=$truth")
      }
    }
  }
}
