package graft

/** Shared driver-side ground truth for the semantic-dedup suites: exact
  * cosine threshold pairs + union-find closure + min-id survivors. ONE
  * implementation so ScaleQueriesSpec (exact q82) and SimilaritySpec
  * (blocked variant) verify against the same reference.
  */
object TestClosure {

  def cosine(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** min-id survivor set of the cosine-≥-tau closure over (id, vector). */
  def cosineSurvivors(vecs: Array[(Long, Array[Double])], tau: Double): Set[Long] = {
    val idx = vecs.map(_._1).zipWithIndex.toMap
    val parent = Array.tabulate(vecs.length)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    for (i <- vecs.indices; j <- (i + 1) until vecs.length)
      if (cosine(vecs(i)._2, vecs(j)._2) >= tau) {
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
    vecs.map(_._1).groupBy(id => find(idx(id))).values.map(_.min).toSet
  }

  /** Full exact component map of the cosine-≥-tau closure: id →
    * min-id of its component (singletons map to themselves).
    */
  def cosineComponents(
      vecs: Array[(Long, Array[Double])], tau: Double): Map[Long, Long] = {
    val idx = vecs.map(_._1).zipWithIndex.toMap
    val parent = Array.tabulate(vecs.length)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    for (i <- vecs.indices; j <- (i + 1) until vecs.length)
      if (cosine(vecs(i)._2, vecs(j)._2) >= tau) {
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
    val minOf = vecs.map(_._1).groupBy(id => find(idx(id)))
      .map { case (root, ids) => root -> ids.min }
    vecs.map { case (id, _) => id -> minOf(find(idx(id))) }.toMap
  }
}
