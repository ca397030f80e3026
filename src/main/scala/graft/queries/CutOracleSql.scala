package graft.queries

/** Shared DuckDB replay of the exact-substring duplicate CUT
  * ([[graft.operators.ExactSubstr.cutDuplicateSpans]]) — the q134
  * oracle's CTE chain, factored so q134 and the fused-pipeline q150
  * replay the SAME spelling and cannot drift (the knScoreCtes /
  * bpeEncCtes rule).
  *
  * Chain: length-`minLen` window digests over every `documents` text →
  * corpus-wide duplicate mark (count ≥ 2) with the lowest-(doc_id, pos)
  * occurrence exempted as the keeper → per-doc gaps-and-islands merge of
  * the cut positions into maximal spans → complement segments stitched
  * back in order. Ends in `cutdocs(doc_id, text, n_spans_cut,
  * n_chars_cut)`: the deduplicated corpus — `text` is the stitched
  * survivor text (the original where nothing was cut, `''` where
  * everything was).
  *
  * Deliberately a DIFFERENT spelling from the Scala fold (window
  * `lag`/`string_agg` vs `aggregate` HOF), so the hash match checks the
  * reconstruction, not a mirrored implementation.
  */
private[queries] object CutOracleSql {

  def ctes(minLen: Int = 50): String = {
    val L = minLen
    s"""w AS (
       |  SELECT doc_id, CAST(i AS INTEGER) AS pos,
       |    unhex(md5(substring(text, CAST(i AS INTEGER), $L))) AS h
       |  FROM documents, unnest(range(1, length(text) - $L + 2)) AS t(i)
       |  WHERE length(text) >= $L),
       |d AS (
       |  SELECT doc_id, pos FROM (
       |    SELECT doc_id, pos,
       |      count(*) OVER (PARTITION BY h) AS cnt,
       |      row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rk
       |    FROM w)
       |  WHERE cnt >= 2 AND rk > 1),
       |g AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > $L
       |      THEN 1 ELSE 0 END AS gap
       |  FROM d),
       |isl AS (
       |  SELECT doc_id, pos,
       |    sum(gap) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS grp
       |  FROM g),
       |cuts AS (
       |  SELECT doc_id, min(pos) AS s, max(pos) + ${L - 1} AS e
       |  FROM isl GROUP BY doc_id, grp),
       |stats AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans_cut,
       |    CAST(sum(e - s + 1) AS BIGINT) AS n_chars_cut
       |  FROM cuts GROUP BY doc_id),
       |kept AS (
       |  SELECT doc_id,
       |    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1 AS ks,
       |    s - 1 AS ke
       |  FROM cuts
       |  UNION ALL
       |  SELECT c.doc_id, max(c.e) + 1 AS ks, any_value(length(t.text)) AS ke
       |  FROM cuts c JOIN documents t USING (doc_id) GROUP BY c.doc_id),
       |stitched AS (
       |  SELECT k.doc_id,
       |    string_agg(substring(t.text, ks, ke - ks + 1), '' ORDER BY ks) AS txt
       |  FROM kept k JOIN documents t USING (doc_id)
       |  WHERE ke >= ks GROUP BY k.doc_id),
       |cutdocs AS MATERIALIZED (
       |  SELECT d2.doc_id,
       |    CASE WHEN st.doc_id IS NULL THEN d2.text
       |         ELSE coalesce(s2.txt, '') END AS text,
       |    coalesce(st.n_spans_cut, 0) AS n_spans_cut,
       |    coalesce(st.n_chars_cut, 0) AS n_chars_cut
       |  FROM documents d2
       |  LEFT JOIN stats st ON st.doc_id = d2.doc_id
       |  LEFT JOIN stitched s2 ON s2.doc_id = d2.doc_id)""".stripMargin
  }
}
