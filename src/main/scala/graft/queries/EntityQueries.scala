package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution: blocked fuzzy matching over catalog descriptors —
  * the record-linkage primitive (find each record's best approximate
  * match) that precedes dedup/merge in any master-data or
  * catalog-reconciliation pipeline.
  *
  * Scale design, two multiplicative reductions before anything
  * quadratic runs:
  *  1. DICTIONARY REDUCTION — descriptors are heavily repeated (20,000
  *     parts → 384 distinct descriptors here; corpus-scale catalogs
  *     behave the same by Zipf), so matching runs on the distinct-string
  *     dictionary with support counts, never on the record stream.
  *  2. BLOCKING — candidate pairs only form inside a shared-token block
  *     (the standard ER blocking key), turning dictionary² into
  *     Σ block². A degenerate high-frequency token would re-inflate
  *     that sum, so blocks are df-capped (the meta-blocking rule, same
  *     discipline as q43's oversized-chunk buckets) — dropped blocks
  *     cost recall only for pairs sharing NO rarer token. q114's cap is
  *     sized to pass everything at these fixtures (the cap path is
  *     pinned by a synthetic spec instead) and is mirrored verbatim in
  *     the oracle.
  * The expensive predicate (edit distance) runs once per surviving
  * candidate pair; best-match-per-record is one window over candidates.
  */
object EntityQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** Best fuzzy match per distinct descriptor string.
    *
    * @param dict     (descr: string, n_parts: long) — the deduplicated
    *                 descriptor dictionary with support counts
    * @param maxBlock blocking-token document-frequency cap: tokens in
    *                 more than this many descriptors generate no
    *                 candidate pairs
    * @param maxDist  edit-distance match threshold
    * @return (descr_a, best_match, dist, n_parts) — one row per
    *         descriptor with at least one in-threshold candidate
    */
  def bestMatches(dict: DataFrame, maxBlock: Int, maxDist: Int): DataFrame = {
    val blocked = dict
      .select(col("descr"), explode(split(col("descr"), " ")).as("blk"))
      .withColumn("blk_df", count(lit(1)).over(Window.partitionBy(col("blk"))))
      .filter(col("blk_df") <= maxBlock)
    val cand = blocked.select(col("blk"), col("descr").as("descr_a"))
      .join(blocked.select(col("blk"), col("descr").as("descr_b")), "blk")
      .filter(col("descr_a") =!= col("descr_b"))
      .select(col("descr_a"), col("descr_b"))
      .distinct() // a pair may share several blocking tokens
      .withColumn("dist", levenshtein(col("descr_a"), col("descr_b")))
      .filter(col("dist") <= maxDist)
    // best match per descriptor via min_by (combinable), not a
    // row_number window over the candidate frame
    cand
      .groupBy(col("descr_a"))
      .agg(min_by(
        struct(col("descr_b"), col("dist")),
        struct(col("dist"), col("descr_b"))).as("b"))
      .join(dict, col("descr_a") === col("descr"))
      .select(col("descr_a"), col("b.descr_b").as("best_match"),
        col("b.dist").as("dist"), col("n_parts"))
  }

  /** Best fuzzy match (edit distance ≤ 10) per distinct part descriptor. */
  private def q114(s: SparkSession, d: String): DataFrame = {
    val dict = Tables.part(s, d)
      .select(concat_ws(" ", col("p_name"), col("p_type")).as("descr"))
      .groupBy(col("descr"))
      .agg(count(lit(1)).as("n_parts"))
    bestMatches(dict, maxBlock = 64, maxDist = 10)
  }

  val defs: Map[String, Q] = Map(
    "q114_entity_match" -> q114)

  val oracles: Map[String, String] = Map(
    "q114_entity_match" ->
      """WITH dict AS (
        |  SELECT p_name || ' ' || p_type AS descr,
        |    CAST(count(*) AS BIGINT) AS n_parts
        |  FROM part GROUP BY 1),
        |blocked AS (
        |  SELECT descr, blk FROM (
        |    SELECT descr, unnest(string_split(descr, ' ')) AS blk FROM dict)
        |  QUALIFY count(*) OVER (PARTITION BY blk) <= 64),
        |cand AS (
        |  SELECT DISTINCT a.descr AS descr_a, b.descr AS descr_b
        |  FROM blocked a JOIN blocked b ON a.blk = b.blk
        |  WHERE a.descr <> b.descr),
        |scored AS (
        |  SELECT * FROM (
        |    SELECT descr_a, descr_b, levenshtein(descr_a, descr_b) AS dist
        |    FROM cand)
        |  WHERE dist <= 10),
        |best AS (
        |  SELECT descr_a, descr_b AS best_match, CAST(dist AS INTEGER) AS dist
        |  FROM scored
        |  QUALIFY row_number() OVER (PARTITION BY descr_a
        |    ORDER BY dist, descr_b) = 1)
        |SELECT b.descr_a, b.best_match, b.dist, d.n_parts
        |FROM best b JOIN dict d ON b.descr_a = d.descr""".stripMargin)
}
