package graft.queries

import graft.Tables
import graft.operators.ProductQuantizer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-quantization search over the embeddings table — the
  * memory-compression counterpart to the IVF (q32) and LSH (q29)
  * index paths. Unlike those Lloyd's/hyperplane-based paths (rows-only
  * checks + recall specs), the PQ pipeline here is built from
  * exactly-replayable pieces (md5-anchor codebook, left-to-right
  * distance folds, rank on 1e-6-rounded ADC), so the whole
  * train→encode→ADC→top-k path is hash-checked against a DuckDB
  * reimplementation — an end-to-end oracle over a genuinely
  * approximate-ANN kernel.
  */
object PqQueries {

  /** q123: ADC shortlist (50 deep) + exact re-rank to top-5 for the
    * first 10 vectors as queries. m=16 subspaces × ks=64 anchors over
    * the 64-dim embeddings: 96-bit codes, 21× compression vs float32;
    * the shortlist holds 0.92 of the exact top-5 at sf0.01
    * (`ProductQuantizerSpec`).
    */
  private def q123(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    ProductQuantizer.adcRerankTopK(
      emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
      k = 5, m = 16, ks = 64, shortlist = 50)
  }

  /** q124: the full IVF-PQ index shape — 16 coarse cells, residual
    * encoding, probe the 6 nearest cells, ADC shortlist 50, exact
    * re-rank to top-5. The ADC scan becomes an equi-join on cell
    * (touching ~6/16 of the corpus instead of all of it); the fine
    * codebook trains on the deterministic md5-gated HALF of the corpus
    * (the production shape — no full-corpus materialization; the gate is
    * replayed verbatim in the oracle's `fine` CTE). Recall@5 is 0.68 vs
    * the flat scan's 0.92 at sf0.01 — nprobe is the dial (6→0.68,
    * full-sample 6→0.70, all-cells ≡ q123's 0.92).
    */
  private def q124(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    ProductQuantizer.ivfPqTopK(
      emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
      k = 5, cells = 16, nprobe = 6, m = 16, ks = 64, shortlist = 50)
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q123_pq_adc" -> q123,
    "q124_ivfpq" -> q124)

  def oracles: Map[String, String] = Map(
    // `dists` is every (vector, subspace, centroid) squared distance; the
    // per-vector argmin of it is the code assignment, and its restriction
    // to query rows IS the ADC lookup table — one frame, both roles. The
    // ADC shortlist ranks on 1e-6-ROUNDED estimates (as does Spark) so
    // float noise cannot flip shortlist membership cross-engine; the
    // final rank re-scores the shortlist with exact full-vector L2.
    "q123_pq_adc" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |hb AS (SELECT vec_id, v, md5(CAST(vec_id AS VARCHAR)) AS h,
        |         CAST(CONCAT('0x', substring(md5(CAST(vec_id AS VARCHAR)), 1, 4))
        |              AS BIGINT) % 64 AS c
        |       FROM e),
        |cent AS (SELECT c, arg_min(v, h) AS cv FROM hb GROUP BY c),
        |js AS (SELECT unnest(range(0, 16)) AS j),
        |dists AS (
        |  SELECT e.vec_id, js.j, cent.c,
        |    list_sum(list_transform(range(1, 5),
        |      i -> (e.v[js.j*4+i] - cent.cv[js.j*4+i])
        |         * (e.v[js.j*4+i] - cent.cv[js.j*4+i]))) AS d
        |  FROM e CROSS JOIN js CROSS JOIN cent),
        |codes AS (
        |  SELECT vec_id, j, c AS code FROM (
        |    SELECT vec_id, j, c,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, c ASC) AS rn
        |    FROM dists) t
        |  WHERE rn = 1),
        |lut AS (SELECT vec_id AS query_id, j, c, d FROM dists WHERE vec_id < 10),
        |adc AS (SELECT l.query_id, cd.vec_id AS neighbor_id,
        |    floor(sum(l.d) * 1000000 + 0.50001) / 1000000 AS adc
        |  FROM codes cd JOIN lut l ON l.j = cd.j AND l.c = cd.code
        |  WHERE cd.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |short AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY adc ASC, neighbor_id ASC) AS rn FROM adc) t
        |  WHERE rn <= 50),
        |rer AS (SELECT s.query_id, s.neighbor_id,
        |    floor(list_sum(list_transform(range(1, 65),
        |      i -> (q.v[i] - n.v[i]) * (q.v[i] - n.v[i]))) * 1000000 + 0.50001)
        |      / 1000000 AS l2
        |  FROM short s
        |  JOIN e q ON q.vec_id = s.query_id
        |  JOIN e n ON n.vec_id = s.neighbor_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY l2 ASC, neighbor_id ASC) AS rank FROM rer)
        |SELECT query_id, neighbor_id, l2, rank FROM r
        |WHERE rank <= 5""".stripMargin,
    // q124: same kernels inside the IVF structure — one dists frame
    // per quantizer level; cell assignment, probe ranking, residuals,
    // fine codes, per-probe LUTs, in-cell ADC, exact re-rank, each on
    // 1e-6-rounded ranks to keep shortlist membership engine-stable.
    "q124_ivfpq" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |hb AS (SELECT vec_id, v, md5(CAST(vec_id AS VARCHAR)) AS h,
        |         CAST(CONCAT('0x', substring(md5(CAST(vec_id AS VARCHAR)), 1, 4))
        |              AS BIGINT) % 16 AS cc,
        |         CAST(CONCAT('0x', substring(md5(CAST(vec_id AS VARCHAR)), 1, 4))
        |              AS BIGINT) % 64 AS fc
        |       FROM e),
        |coarse AS (SELECT cc, arg_min(v, h) AS cv,
        |             row_number() OVER (ORDER BY cc) - 1 AS cpos
        |           FROM hb GROUP BY cc),
        |cdists AS (
        |  SELECT e.vec_id, coarse.cpos,
        |    list_sum(list_transform(range(1, 65),
        |      i -> (e.v[i] - coarse.cv[i]) * (e.v[i] - coarse.cv[i]))) AS d
        |  FROM e CROSS JOIN coarse),
        |cellof AS (
        |  SELECT vec_id, cpos AS cell FROM (
        |    SELECT vec_id, cpos, row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cpos ASC) AS rn
        |    FROM cdists) t WHERE rn = 1),
        |resid AS (
        |  SELECT e.vec_id,
        |    list_transform(range(1, 65), i -> e.v[i] - coarse.cv[i]) AS rv,
        |    cellof.cell
        |  FROM e JOIN cellof USING (vec_id) JOIN coarse ON coarse.cpos = cellof.cell),
        |fine AS (SELECT hb.fc, arg_min(resid.rv, hb.h) AS fv
        |         FROM resid JOIN hb USING (vec_id)
        |         WHERE CAST(CONCAT('0x', substring(hb.h, 5, 4)) AS BIGINT) % 2 = 0
        |         GROUP BY hb.fc),
        |js AS (SELECT unnest(range(0, 16)) AS j),
        |fdists AS (
        |  SELECT resid.vec_id, js.j, fine.fc,
        |    list_sum(list_transform(range(1, 5),
        |      i -> (resid.rv[js.j*4+i] - fine.fv[js.j*4+i])
        |         * (resid.rv[js.j*4+i] - fine.fv[js.j*4+i]))) AS d
        |  FROM resid CROSS JOIN js CROSS JOIN fine),
        |codes AS (
        |  SELECT vec_id, j, fc AS code FROM (
        |    SELECT vec_id, j, fc,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, fc ASC) AS rn
        |    FROM fdists) t
        |  WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, cpos AS cell FROM (
        |    SELECT vec_id, cpos,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY floor(d * 1000000 + 0.50001) / 1000000 ASC, cpos ASC) AS rn
        |    FROM cdists WHERE vec_id < 10) t
        |  WHERE rn <= 6),
        |qlut AS (
        |  SELECT p.query_id, p.cell, js.j, fine.fc,
        |    list_sum(list_transform(range(1, 5),
        |      i -> ((e.v[(js.j*4+i)] - coarse.cv[(js.j*4+i)]) - fine.fv[js.j*4+i])
        |         * ((e.v[(js.j*4+i)] - coarse.cv[(js.j*4+i)]) - fine.fv[js.j*4+i]))) AS d
        |  FROM probes p
        |  JOIN e ON e.vec_id = p.query_id
        |  JOIN coarse ON coarse.cpos = p.cell
        |  CROSS JOIN js CROSS JOIN fine),
        |adc AS (
        |  SELECT l.query_id, cd.vec_id AS neighbor_id,
        |    floor(sum(l.d) * 1000000 + 0.50001) / 1000000 AS adc
        |  FROM cellof co
        |  JOIN qlut l ON l.cell = co.cell
        |  JOIN codes cd ON cd.vec_id = co.vec_id AND cd.j = l.j AND cd.code = l.fc
        |  WHERE co.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |short AS (SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY adc ASC, neighbor_id ASC) AS rn FROM adc) t
        |  WHERE rn <= 50),
        |rer AS (SELECT s.query_id, s.neighbor_id,
        |    floor(list_sum(list_transform(range(1, 65),
        |      i -> (q.v[i] - n.v[i]) * (q.v[i] - n.v[i]))) * 1000000 + 0.50001)
        |      / 1000000 AS l2
        |  FROM short s
        |  JOIN e q ON q.vec_id = s.query_id
        |  JOIN e n ON n.vec_id = s.neighbor_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY l2 ASC, neighbor_id ASC) AS rank FROM rer)
        |SELECT query_id, neighbor_id, l2, rank FROM r
        |WHERE rank <= 5""".stripMargin)
}
