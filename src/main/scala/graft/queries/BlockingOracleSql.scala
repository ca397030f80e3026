package graft.queries

/** Shared DuckDB-oracle SQL fragments for the blocked-SemDeDup family
  * (q50/q94/q131) — one builder so the three replays cannot drift.
  *
  * Two r9 scalability reworks, both exactness-preserving:
  *
  *  - `sc` computes cell scores as `list_inner_product(v, cv) - hn`
  *    with the half-squared-norm HOISTED into the `cn` CTE, instead of
  *    re-deriving the norm per (vector, cell) row through a lambda
  *    chain (measured 6× at sf1: 12.5 → 2.0 s for the assignment
  *    prefix). The dot kernel's accumulation order may differ from the
  *    native `NearestCells` loop by ulps, but only the CELL CHOICE
  *    feeds the blocking — and `FrozenCodebookSpec` asserts every
  *    vector's rank-4/5 margin exceeds 1e-9 on every committed
  *    (corpus, book) pairing, orders of magnitude above any
  *    reassociation drift on 64-term double dots.
  *
  *  - the component closure is fixed-round MIN-LABEL PROPAGATION with
  *    pointer doubling (each round takes the min over neighbors AND
  *    jumps `lbl → lbl(lbl)`), replacing the naive `reach` transitive
  *    closure that materializes Σ component² rows — 377M at sf1, where
  *    the τ=0.4 graph percolates into one 19.4k-node component (oracle
  *    DNF at a 600 s budget; the rework replays in ~14 s). 20 rounds
  *    converge for any graph these corpora produce (hybrid
  *    neighbor-min + doubling is O(log n) rounds); convergence is
  *    ASSERTED, not assumed — a `(-1, -1)` poison row is emitted iff
  *    any node still sees a smaller neighbor label, so an unconverged
  *    replay hash-fails loudly instead of passing with a wrong map.
  */
private[queries] object BlockingOracleSql {

  /** CTE chain `ev, cent, cn, sc, cells`: scale-gated frozen codebook,
    * fast score formulation, rn ≤ `nprobe` cell assignment. Callers
    * append their own CTEs after it.
    */
  def assignPrefix(nprobe: Int): String = {
    val cent = graft.model.IvfCentroids.blockingCentSql
    s"""ev AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent AS MATERIALIZED (
       |$cent),
       |cn AS MATERIALIZED (
       |  SELECT cpos, cv, list_sum(list_transform(cv, x -> x * x)) / 2 AS hn FROM cent),
       |sc AS (
       |  SELECT ev.vec_id, cn.cpos, list_inner_product(ev.v, cn.cv) - cn.hn AS s
       |  FROM ev CROSS JOIN cn),
       |cells AS MATERIALIZED (
       |  SELECT vec_id, cpos AS cell FROM (
       |    SELECT vec_id, cpos,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cpos ASC) AS rn
       |    FROM sc) t WHERE rn <= $nprobe)""".stripMargin
  }

  /** CTEs `occ, cand, e, sym`: cosine-verified shared-cell candidate
    * edges over the `cells`/`ev` CTEs of [[assignPrefix]], replaying
    * `Similarity.blockedNearDupPairs`' per-cell occupancy cap: cells
    * over `maxCellFactor × mean occupancy` (floor 64) contribute only
    * their star through the min id, exactly as the Scala side does —
    * same cap formula off the same `count(*)`s, so the two engines can
    * never disagree on which arm a cell takes.
    */
  def edgeCtes(tau: Double, nprobe: Int, maxCellFactor: Double = 10.0): String =
    s"""occ AS MATERIALIZED (
       |  SELECT vec_id, cell,
       |    count(*) OVER (PARTITION BY cell) AS cnt,
       |    min(vec_id) OVER (PARTITION BY cell) AS mn
       |  FROM cells),
       |cap AS MATERIALIZED (
       |  SELECT greatest(64, CAST(ceil($maxCellFactor * $nprobe
       |    * (SELECT count(*) FROM ev) / (SELECT count(*) FROM cent)) AS BIGINT)) AS mx),
       |cand AS (
       |  SELECT x.vec_id AS s, y.vec_id AS d
       |  FROM occ x JOIN occ y ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  CROSS JOIN cap WHERE x.cnt <= cap.mx
       |  UNION ALL
       |  SELECT mn AS s, vec_id AS d FROM occ CROSS JOIN cap
       |  WHERE cnt > cap.mx AND vec_id != mn),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT c.s AS src, c.d AS dst
       |  FROM cand c
       |  JOIN ev a ON a.vec_id = c.s
       |  JOIN ev b ON b.vec_id = c.d
       |  WHERE list_cosine_similarity(a.v, b.v) >= $tau),
       |sym AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e)""".stripMargin

  /** Label-propagation rounds `l0 … l<rounds>` over `sym`, plus the
    * `conv` convergence check. The final map lives in `l<rounds>`;
    * callers must UNION the poison guard (see [[poisonGuard]]).
    */
  def closureCtes(rounds: Int): String = {
    val chain = (0 until rounds).map { k =>
      s"""l${k + 1} AS MATERIALIZED (
         |  SELECT n.id, least(n.lbl, coalesce(m.mn, n.lbl), coalesce(p.plbl, n.lbl)) AS lbl
         |  FROM l$k n
         |  LEFT JOIN (SELECT s.src AS id, min(x.lbl) AS mn
         |             FROM sym s JOIN l$k x ON x.id = s.dst GROUP BY s.src) m ON m.id = n.id
         |  LEFT JOIN (SELECT a.id, b.lbl AS plbl FROM l$k a JOIN l$k b ON b.id = a.lbl) p ON p.id = n.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM sym),
       |$chain,
       |conv AS (
       |  SELECT count(*) AS bad FROM l$rounds n
       |  JOIN (SELECT s.src AS id, min(x.lbl) AS mn
       |        FROM sym s JOIN l$rounds x ON x.id = s.dst GROUP BY s.src) m
       |    ON m.id = n.id AND m.mn < n.lbl)""".stripMargin
  }

  /** Poison row emitted iff the propagation did not converge — shaped
    * by the caller to its own column list so the hash compare fails
    * loudly. `cols` example: `"-1, -1"`.
    */
  def poisonGuard(cols: String): String =
    s"SELECT $cols FROM conv WHERE bad > 0"

  val rounds = 20
}
