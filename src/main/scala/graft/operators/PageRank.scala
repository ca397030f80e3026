package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a directed edge list — the canonical iterative
  * dataflow beyond connected components (importance scoring of pages /
  * hosts / users feeding crawl prioritization and source weighting in a
  * corpus pipeline).
  *
  * Simplified model: dangling nodes (no out-edges) leak their rank mass
  * — no redistribution — which keeps every iteration a pure
  * join + aggregate and makes the result reproducible in plain SQL (the
  * oracle unrolls the same fixed iterations). Each round is one shuffle
  * join (ranks ⋈ edges on src) plus one aggregation (sum contributions
  * by dst); lineage is cut per round with an eager localCheckpoint, the
  * same pattern as [[ConnectedComponents]] — plan size stays constant
  * over iterations, and the edge/degree frame is materialized once.
  */
object PageRank {

  /** @param edges two-column (src, dst) directed edge list, deduplicated
    *              or not (duplicate edges count as parallel edges)
    * @param checkpointEvery cut lineage every k-th round — a handful of
    *              chained join+agg rounds plan fine, so paying a
    *              materialization job EVERY round (as CC must, with its
    *              unbounded round count) just adds fixed cost per round;
    *              the default cuts once per 4 rounds which keeps plan
    *              depth bounded for any `iters`
    * @return (id, rank) for every node appearing as src or dst;
    *         Σrank ≤ 1 (dangling leak)
    */
  def run(
      edges: DataFrame,
      damping: Double = 0.85,
      iters: Int = 3,
      checkpointEvery: Int = 4): DataFrame =
    runWithNodeCount(edges, damping, iters, checkpointEvery)._1

  /** [[run]], also returning the node count (already computed on the
    * driver for the base-mass literal). Callers that need |V| — e.g. to
    * scale ranks to mean 1 — MUST take it from here rather than
    * re-deriving it with a global window or a count over the rank frame:
    * `count().over(Window.partitionBy())` funnels the whole |V|-sized
    * frame through one partition, and a second count re-evaluates the
    * iteration chain.
    */
  def runWithNodeCount(
      edges: DataFrame,
      damping: Double = 0.85,
      iters: Int = 3,
      checkpointEvery: Int = 4): (DataFrame, Long) = {
    require(iters >= 1 && damping > 0 && damping < 1 && checkpointEvery >= 1)
    val e = edges.toDF("src", "dst").localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    // Out-degree rides with each edge so an iteration needs no extra
    // join; hash-partitioned on src ONCE before the checkpoint so every
    // round's ranks-join reuses that layout (ranks leave each round
    // partitioned by id, which alias-propagates through the src rename —
    // the per-round join plans with zero exchanges).
    val withDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("__outd")), "src")
      .repartition(col("src"))
      .localCheckpoint(true)
    // Every node contributes its damped base mass through the SAME
    // aggregate that sums edge contributions (union, then one groupBy) —
    // a round is one join + one shuffle. The earlier nodes-LEFT-JOIN-
    // contribs formulation spent a second shuffle join per round only to
    // re-attach nodes that received no mass.
    // no checkpoint: base is a literal-append PROJECTION over the
    // already-checkpointed nodes blocks — each iteration's union re-reads
    // those blocks and re-applies one codegen'd map, which is cheaper
    // than the extra materialization job + second block copy the old
    // eager checkpoint paid (r16: one fewer job per PageRank call)
    val base = nodes
      .select(col("id"), lit((1 - damping) / n).as("__c"))
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iters) {
      val contribs = withDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          (lit(damping) * col("rank") / col("__outd")).as("__c"))
      val next = base.unionAll(contribs)
        .groupBy("id")
        .agg(sum("__c").as("rank"))
      ranks = if (i % checkpointEvery == 0 && i < iters) next.localCheckpoint(true) else next
    }
    (ranks, n)
  }
}
