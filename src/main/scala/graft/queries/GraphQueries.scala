package graft.queries

import graft.Tables
import graft.functions.TriangleCredits
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics beyond PageRank (q76) and connected components (q50):
  * triangle counting over the part co-purchase graph (parts that appear
  * in the same order share an edge).
  *
  * Scale design — the classic degree-ordered orientation (Schank &
  * Wagner 2005): every undirected edge is directed from its
  * LOWER-(degree, id) endpoint to the higher one, so any node's oriented
  * out-degree is bounded by its count of HIGHER-degree neighbors
  * (≤ √(2·|E|)) and total triangle work is O(|E|^1.5) instead of Σ deg².
  * On top of that orientation this uses the EDGE-ITERATOR formulation,
  * not wedge materialization: per oriented edge (u,v) the triangles
  * through it are |N⁺(u) ∩ N⁺(v)|, computed by a codegen'd merge walk
  * over the two SORTED out-neighbor arrays (`TriangleCredits`). The
  * wedge-join alternative materializes O(|E|^1.5) ROWS (41M at sf0.1)
  * through a shuffle or hash probe — measured 4–10× slower purely on
  * per-row overhead; the merge walk keeps the same work inside tight
  * primitive loops, touching only |E| rows. Every triangle u→v, u→w,
  * v→w is found exactly once, at its base edge (u,v), crediting u and v
  * once per closing w and each w once.
  *
  * Data layout: the whole pipeline is adjacency-ARRAY shaped — two
  * shuffles build the undirected adjacency (per-order baskets, then
  * per-node neighbor sets), one more re-groups the oriented arrays; the
  * final pass streams edges out of their owner's adjacency row and
  * attaches the dst adjacency by a SHUFFLE hash join (explode → shuffle
  * attach → merge walk → explode credits → hash agg). Nothing
  * broadcasts at data scale: degrees and adjacency are |V|- and
  * |E|-sized, both unbounded, so both joins are hash-partitioned —
  * per-executor memory never holds more than its partition of the
  * build side. Nothing row-expands beyond Σ basket² ≈ 2|E|; the
  * shuffled bytes of the final attach are bounded by the same
  * O(|E|^1.5) term as the merge-walk compute (each edge row carries
  * one sorted out-neighbor array of ≤ √(2|E|) entries). A pathological
  * hub node would cap via degree-based edge sampling (Pagh &
  * Tsourakakis 2012) before the adjacency build; basket sizes here are
  * order line counts, naturally small. Scale growth is measured, not
  * asserted: `GraphScaleBench` (GRAPHSCALE.json) fits time vs |E| for
  * q110/q76/q50 at 1×/scaled replicas.
  */
object GraphQueries {
  private type Q = (SparkSession, String) => DataFrame

  private def byDegThenId(du: Column, u: Column, dv: Column, v: Column): Column =
    du < dv || (du === dv && u < v)

  /** Per-part triangle participation counts in the co-purchase graph. */
  private def q110(s: SparkSession, d: String): DataFrame = {
    val nPart = s.sessionState.conf.numShufflePartitions
    // per-order baskets → all directed co-purchase pairs (Σ basket², the
    // natural basket size squared) → per-node sorted neighbor sets.
    // collect_set dedupes edge multiplicity across orders, so no
    // edge-level distinct shuffle is ever needed. The explicit
    // repartitions ahead of each adjacency aggregation are deliberate:
    // the shuffled BYTES are node-count-small, so AQE would coalesce to
    // 1-4 tasks — but the WORK these stages emit (pair expansion, array
    // builds, the merge-walk pass) is edge-scale. Partition for the work
    // you emit, not the bytes you read; an explicit repartition is
    // exempt from AQE coalescing.
    val und = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .repartition(nPart, col("o"))
      .groupBy(col("o")).agg(collect_set(col("p")).as("ps"))
      .select(explode(col("ps")).as("u"), col("ps"))
      .select(col("u"), explode(col("ps")).as("v"))
      .filter(col("u") =!= col("v"))
      .repartition(nPart, col("u"))
      .groupBy(col("u")).agg(sort_array(collect_set(col("v"))).as("nbrs"))
    // orientation: keep only higher-(degree, id) neighbors. Degrees are
    // |V| × 2 longs and arrive per NEIGHBOR via the exploded join below
    // (the owner's degree is just size(nbrs)). No forced strategy and no
    // explicit broadcast(): |V| grows with the data, so the PLAN must
    // not bake in a node-scale broadcast — but a degree table that
    // happens to fit executor memory is exactly what AQE's runtime
    // shuffle→broadcast conversion is for, so the decision stays with
    // the runtime statistics at every scale. The shuffled edge rows are
    // three longs each either way.
    val degB = und.select(col("u").as("v"), size(col("nbrs")).as("dv"))
    val adj = und
      .select(col("u"), size(col("nbrs")).as("du"), explode(col("nbrs")).as("v"))
      .join(degB, "v")
      .filter(byDegThenId(col("du"), col("u"), col("dv"), col("v")))
      .repartition(nPart, col("u"))
      .groupBy(col("u")).agg(sort_array(collect_list(col("v"))).as("nbrs"))
    val adjD = adj.select(col("u").as("dst"), col("nbrs").as("nd"))
    // No checkpoints: everything runs as ONE action, so the und/adj
    // subplans appearing under the degree broadcast and the edge stream
    // share their shuffle exchanges via ReuseExchange instead of paying
    // a materialization job each (the per-job overhead dominated the
    // checkpointed variant). The final pass: stream every oriented edge
    // out of its owner's adjacency row (ns rides along — generated
    // in-place, never shuffled), SHUFFLE-join the dst adjacency on dst
    // — NOT a broadcast: the oriented adjacency is O(|E|) entries, and
    // an edge-scale broadcast is a multi-GB per-executor copy at
    // cluster scale. The shuffled bytes are bounded by the same
    // O(|E|^1.5) term as the merge-walk compute (each edge row carries
    // ns ≤ √(2|E|) entries), so the join never dominates the
    // algorithm's own bound; the dst side reuses adj's existing hash
    // layout, and the hash-join hint keeps the edge stream from being
    // sort-merged.
    adj.select(col("u").as("src"), col("nbrs").as("ns"), explode(col("nbrs")).as("dst"))
      .join(adjD.hint("shuffle_hash"), "dst")
      .select(explode(TriangleCredits.toCol(
        col("ns"), col("nd"), col("src"), col("dst"))).as("m"))
      .groupBy(col("m.part_id").as("part_id"))
      .agg(sum(col("m.c")).as("n_triangles"))
  }

  val defs: Map[String, Q] = Map(
    "q110_triangle_count" -> q110)

  val oracles: Map[String, String] = Map(
    "q110_triangle_count" ->
      """WITH co AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM co a JOIN co b ON a.o = b.o AND a.p < b.p),
        |t AS (
        |  SELECT e1.u AS n1, e1.v AS n2, e2.v AS n3
        |  FROM e e1
        |  JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |members AS (
        |  SELECT n1 AS part_id FROM t
        |  UNION ALL SELECT n2 FROM t
        |  UNION ALL SELECT n3 FROM t)
        |SELECT part_id, count(*) AS n_triangles
        |FROM members GROUP BY part_id""".stripMargin)
}
