package graft.functions

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class MinHashAggSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def sig(t: String): Array[Long] =
    MinHashSig.compute(t, 64, 5).toLongArray()

  test("union signature = elementwise min across the group, through Spark partial+final agg") {
    // signatures computed driver-side (the closure must not capture the
    // non-serializable spec class), then spread over 4 partitions to
    // force partial+final aggregation
    val docs = spark.createDataset(Seq(
      ("g1", sig("alpha beta gamma delta epsilon zeta")),
      ("g1", sig("eta theta iota kappa lambda mu")),
      ("g2", sig("nu xi omicron pi rho sigma")))).repartition(4)
    val out = docs
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(MinHashAgg.unionSignature(64).name("usig"))
      .collect().toMap
    val expected1 = sig("alpha beta gamma delta epsilon zeta")
      .zip(sig("eta theta iota kappa lambda mu")).map(p => math.min(p._1, p._2))
    assert(out("g1").sameElements(expected1))
    assert(out("g2").sameElements(sig("nu xi omicron pi rho sigma")))
  }

  test("group signatures estimate cross-corpus overlap") {
    val shared = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val a = Seq(("A", shared), ("A", "unique content for corpus a only here"))
    val b = Seq(("B", shared), ("B", "totally different words for corpus b instead"))
    val c = Seq(("C", "nothing in common with either corpus whatsoever right"))
    val sigs = spark.createDataset(
      (a ++ b ++ c).map { case (g, t) => (g, sig(t)) })
      .groupByKey(_._1).mapValues(_._2)
      .agg(MinHashAgg.unionSignature(64).name("s"))
      .collect().toMap
    val ab = MinHashSig.estimate(sigs("A"), sigs("B"))
    val ac = MinHashSig.estimate(sigs("A"), sigs("C"))
    assert(ab > 0.25, s"A/B share half their content: $ab") // substantial overlap
    assert(ac < 0.15, s"A/C share nothing: $ac")
    assert(ab > ac)
  }
}
