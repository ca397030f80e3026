package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics beyond PageRank (q76) and connected components (q50):
  * triangle counting over the part co-purchase graph (parts that appear
  * in the same order share an edge).
  *
  * Scale design — the classic degree-ordered orientation (Schank &
  * Wagner 2005 / Cohen's MapReduce formulation): every undirected edge
  * is directed from its LOWER-(degree, id) endpoint to the higher one,
  * which turns the wedge join into "join the oriented adjacency list
  * with itself on the source". The heaviest node's adjacency fan-out is
  * bounded by the number of HIGHER-degree neighbors (≤ √(2·|E|)), so
  * the wedge count is O(|E|^1.5) instead of Σ deg² — the difference
  * between a skewed social graph finishing and not. Each wedge is then
  * closed by ONE semi-join against the oriented edge list; every
  * triangle is counted exactly once at its lowest-order apex.
  */
object GraphQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** Per-part triangle participation counts in the co-purchase graph. */
  private def q110(s: SparkSession, d: String): DataFrame = {
    val co = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    // per-order pair expansion: bounded by (lines per order)², the
    // natural basket size — salted via SkewJoin if a pathological
    // mega-order existed (the plan lint keeps this an equi-join)
    val edges = co.select(col("o"), col("p").as("pa"))
      .join(co.select(col("o"), col("p").as("pb")), "o")
      .filter(col("pa") < col("pb"))
      .select(col("pa").as("u"), col("pb").as("v"))
      .distinct()
      .localCheckpoint(true) // reused 3×: degrees, orientation, wedge closing
    val deg = edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // node-count-sized frame: broadcast both degree lookups
    val du = broadcast(deg.select(col("node").as("u"), col("deg").as("du")))
    val dv = broadcast(deg.select(col("node").as("v"), col("deg").as("dv")))
    val oriented = edges.join(du, "u").join(dv, "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("src"), col("v").as("dst"), col("dv").as("ddeg")))
          .otherwise(
            struct(col("v").as("src"), col("u").as("dst"), col("du").as("ddeg")))
          .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.ddeg").as("ddeg"))
      .localCheckpoint(true) // reused: both wedge sides + the closing semi-join
    val wedges = oriented.select(col("src"), col("dst").as("n2"), col("ddeg").as("d2"))
      .join(oriented.select(col("src"), col("dst").as("n3"), col("ddeg").as("d3")), "src")
      .filter(col("d2") < col("d3") || (col("d2") === col("d3") && col("n2") < col("n3")))
      .select(col("src").as("n1"), col("n2"), col("n3"))
    val triangles = wedges.join(
      oriented.select(col("src").as("n2"), col("dst").as("n3")),
      Seq("n2", "n3"), "left_semi")
    triangles
      .select(explode(array(col("n1"), col("n2"), col("n3"))).as("part_id"))
      .groupBy(col("part_id"))
      .agg(count(lit(1)).as("n_triangles"))
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
