package graft.queries

import graft.Tables
import graft.operators.Spread
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators, round 4 batch 2: the remaining document-
  * hygiene passes a training-data pipeline runs between ingestion and
  * tokenization — span-level exact dedup (the C4 trick, at span not doc
  * granularity), a constraint-audit report, robust outlier detection,
  * and the pair-counting step at the core of BPE tokenizer training.
  *
  * Scale shapes: q105 shuffles (doc, span) rows keyed by the span HASH —
  * the 100 TB corpus never shuffles as whole documents; q106 is ONE
  * aggregation pass per audited table plus one join for the referential
  * check — the report is O(#constraints) rows regardless of input size;
  * q107 is three grouped passes (median, MAD, threshold count) whose
  * intermediate per-group frames are broadcast back; q108's pair counts
  * are computed on the word-frequency table (vocabulary-sized, Zipf —
  * orders of magnitude smaller than the corpus), not on raw text.
  */
object CurationQueries {
  private type Q = (SparkSession, String) => DataFrame

  private def r6(c: Column): Column = floor(c * 1000000 + lit(0.50001)) / 1000000

  /** C4-style span-level exact dedup: split every document into
    * non-overlapping 10-word spans, keep only the globally FIRST
    * occurrence of each distinct span (ordered by doc_id, then span
    * position), and reassemble the surviving text. Duplicated
    * boilerplate is removed from every document except the one that said
    * it first — doc-level dedup (q20) can't catch this, because the
    * surrounding text differs.
    *
    * First-occurrence choice partitions by md5(span) — at 100 TB the
    * dedup shuffle carries a 16-byte key, and the span text rides along
    * only for the reassembly that follows anyway.
    */
  private def q105(s: SparkSession, d: String): DataFrame = {
    val spanWords = 10
    val spans = Spread.ensure(Tables.documents(s, d).select("doc_id", "text"))
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .filter(length(col("col")) > 0)
      .withColumn("span_idx", floor(col("pos") / spanWords).cast("long"))
      .groupBy(col("doc_id"), col("span_idx"))
      .agg(
        array_join(
          transform(
            sort_array(collect_list(struct(col("pos"), col("col")))),
            e => e("col")),
          " ").as("span_text"))
    val firstWins = Window
      .partitionBy(md5(col("span_text")))
      .orderBy(col("doc_id"), col("span_idx"))
    spans
      .withColumn("rn", row_number().over(firstWins))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            filter(
              sort_array(collect_list(struct(
                col("span_idx"), col("span_text"), (col("rn") === 1).as("keep")))),
              e => e("keep")),
            e => e("span_text")),
          " ").as("text_dedup"))
  }

  /** Data-quality constraint audit (the Deequ shape): a fixed suite of
    * constraints over orders + lineitem, each reported as one
    * (constraint, value, pass) row. Every per-table metric family is
    * computed in ONE combinable aggregation pass over that table; the
    * referential check is the only join. At 100 TB the report costs two
    * scans and one shuffle — and is 6 rows.
    */
  private def q106(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    val oAgg = o.agg(
      count(lit(1)).as("n"),
      count_distinct(col("o_orderkey")).as("nd"),
      sum(when(col("o_totalprice") < 0, 1L).otherwise(0L)).as("neg"),
      sum(when(col("o_orderstatus").isInCollection(Seq("F", "O", "P")), 0L)
        .otherwise(1L)).as("bad_status"))
    val ordersReport = oAgg.select(explode(array(
      struct(
        lit("orders_pk_unique").as("check_name"),
        r6(col("nd").cast("double") / col("n")).as("value"),
        (col("nd") === col("n")).as("pass")),
      struct(
        lit("orders_price_nonneg").as("check_name"),
        r6(col("neg").cast("double") / col("n")).as("value"),
        (col("neg") === 0L).as("pass")),
      struct(
        lit("orders_status_domain").as("check_name"),
        r6(col("bad_status").cast("double") / col("n")).as("value"),
        (col("bad_status") === 0L).as("pass")))).as("r"))
    val lAgg = l.agg(
      count(lit(1)).as("n"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("null_ship"),
      sum(when(col("l_quantity") >= 1 && col("l_quantity") <= 50, 0L)
        .otherwise(1L)).as("bad_qty"))
    val lineReport = lAgg.select(explode(array(
      struct(
        lit("lineitem_shipdate_nonnull").as("check_name"),
        r6(col("null_ship").cast("double") / col("n")).as("value"),
        (col("null_ship") === 0L).as("pass")),
      struct(
        lit("lineitem_qty_range").as("check_name"),
        r6(col("bad_qty").cast("double") / col("n")).as("value"),
        (col("bad_qty") === 0L).as("pass")))).as("r"))
    val fk = l.select(col("l_orderkey"))
      .join(o.select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("orphans"))
      .select(explode(array(
        struct(
          lit("lineitem_fk_orders").as("check_name"),
          r6(col("orphans").cast("double") / col("n")).as("value"),
          (col("orphans") === 0L).as("pass")))).as("r"))
    ordersReport.unionAll(lineReport).unionAll(fk)
      .select(col("r.check_name"), col("r.value"), col("r.pass"))
  }

  /** Robust outlier detection per event type: median / MAD (median
    * absolute deviation, consistency constant 1.4826), flagging values
    * beyond 3 robust sigmas. Unlike mean/stddev, one corrupted feed
    * can't drag the threshold. Exact medians keep the query
    * oracle-checkable; the 100 TB variant swaps in the existing
    * approx-quantile sketches (q36/q64) without changing shape.
    * Deviations and thresholds are rounded to the same 1e-6 grid before
    * comparison so the outlier COUNT can't flip on interpolation ulp.
    */
  private def q107(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        r6(first(col("med"))).as("median_value"),
        r6(first(col("mad"))).as("mad"),
        sum(when(r6(col("adev")) > r6(lit(3 * 1.4826) * col("mad")), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** The inner step of BPE tokenizer training: corpus-frequency-weighted
    * counts of adjacent character pairs, top 50. Counting runs on the
    * word-frequency table, not the corpus — Zipf makes that table tiny
    * relative to 100 TB of text, which is exactly why BPE training
    * scales. The full iterative trainer (pick top pair, merge, recount)
    * is `operators.Bpe`, spec-pinned against an independent
    * implementation; this query oracle-checks its hottest piece.
    */
  private def q108(s: SparkSession, d: String): DataFrame = {
    val words = Spread.ensure(Tables.documents(s, d).select("text"))
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val counts = words
      .select(
        col("freq"),
        explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("cnt"))
    // top-50 via TakeOrderedAndProject, not a global row_number window —
    // the pair vocabulary is Zipf-small but still grows with the corpus,
    // and a single-partition sort of it is a needless scale ceiling
    graft.operators.Ranking
      .topK(counts, 50, Seq(col("cnt").desc, col("pair")), "rank")
      .select(col("pair"), col("cnt"), col("rank"))
  }

  /** Blocklist scan: which blocklisted phrases occur in each document,
    * as substrings, matched by ONE Aho-Corasick pass over the text
    * regardless of blocklist size (`functions.AhoMatches` — the
    * `OR contains` spelling rescans the document per pattern and dies at
    * real blocklist sizes). The pattern set exercises all three match
    * shapes: multi-word phrases, a high-frequency single token, and a
    * phrase absent from the corpus.
    */
  private def q116(s: SparkSession, d: String): DataFrame = {
    val blocklist = Seq("table table", "fast merge", "agg row scan", "spark", "quantum")
    Spread.ensure(Tables.documents(s, d).select("doc_id", "text"))
      .select(col("doc_id"),
        graft.functions.AhoMatches.toCol(col("text"), blocklist).as("m"))
      .filter(size(col("m")) > 0)
      .select(
        col("doc_id"),
        size(col("m")).as("n_matched"),
        array_join(col("m"), ",").as("matched"))
  }

  /** URL canonicalization + per-host collapse stats. The corpus has no
    * URL column, so raw URLs are synthesized deterministically from
    * (source, doc_id) with the variant shapes that plague real crawls —
    * scheme/case/www/port/trailing-slash/tracking-param/fragment noise —
    * and the operator under test is `UrlOps.canonicalUrl`
    * (graft/operators/UrlOps.scala), which must collapse them. The
    * oracle re-canonicalizes with an independent regexp spelling (no
    * parse_url in DuckDB), so the java.net.URL-based path is
    * cross-checked, not mirrored.
    *
    * Scale shape: per-row string expressions (codegen'd, map-side) +
    * ONE aggregation shuffle keyed by host. distinct-counts are exact
    * and per-host-bounded; host cardinality is web-scale-bounded
    * (~10⁸), a fine hash-agg key space.
    *
    * `parse_url` (an interpreted `Invoke(ParseUrlEvaluator)`, the plan's
    * most expensive node) is hoisted into its own projection via
    * `UrlOps.parsedHost/Path/Query` so each component is parsed ONCE per
    * row — three invocations total. The naive
    * `canonicalHost(raw) + canonicalUrl(raw)` spelling re-parsed HOST
    * twice and PATH/QUERY inside the same Project (5×/row) and made
    * q119 the suite's slowest query. `CollapseProject` keeps the
    * staging projections separate because `Invoke` is not a cheap
    * expression.
    */
  private def q119(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val raw = concat(
      when(id % 2 === 0, lit("https://")).otherwise(lit("http://")),
      when(id % 3 === 0, lit("www.")).otherwise(lit("")),
      when(id % 7 === 0, upper(col("source"))).otherwise(col("source")),
      lit(".example.com"),
      when(id % 2 === 0 && id % 11 === 0, lit(":443")).otherwise(lit("")),
      lit("/articles/"), expr("CAST(doc_id DIV 10 AS STRING)"),
      when(id % 5 === 0, lit("/")).otherwise(lit("")),
      when(id % 4 === 0,
        concat(lit("?utm_source=feed"),
          when(id % 8 === 0,
            concat(lit("&page="), expr("CAST((doc_id DIV 8) % 5 AS STRING)")))
            .otherwise(lit(""))))
        .otherwise(lit("")),
      when(id % 6 === 0, lit("#s2")).otherwise(lit("")))
    import graft.operators.UrlOps
    Tables.documents(s, d)
      .select(col("doc_id"), raw.as("raw"))
      .select(col("raw"),
        UrlOps.parsedHost(col("raw")).as("h0"),
        UrlOps.parsedPath(col("raw")).as("p0"),
        UrlOps.parsedQuery(col("raw")).as("q0"))
      .select(col("raw"),
        UrlOps.hostFromParsed(col("h0")).as("host"),
        col("p0"), col("q0"))
      .select(
        col("raw"), col("host"),
        UrlOps.urlFromParsed(col("host"), col("p0"), col("q0")).as("canon"))
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("raw")).as("n_raw"),
        countDistinct(col("canon")).as("n_canon"))
  }

  /** Suffix-array-family exact substring dedup (r9 verdict #7):
    * maximal spans of length ≥ 50 whose content also occurs elsewhere in
    * the corpus — [[graft.operators.ExactSubstr.duplicateSpans]], the
    * alignment-free complement to q105's span-boundary trick. The oracle
    * replays the bounded-window formulation verbatim (window digests →
    * corpus-wide count ≥ 2 → per-doc interval union), so the whole span
    * map is hash-checked.
    */
  private def q133(s: SparkSession, d: String): DataFrame =
    graft.operators.ExactSubstr.duplicateSpans(
      Tables.documents(s, d), "doc_id", "text", minLen = 50)

  /** The q133 family's APPLY sibling (r10 verdict #4, the q30/q31
    * pattern): the deduplicated corpus itself —
    * [[graft.operators.ExactSubstr.cutDuplicateSpans]], keep policy =
    * lowest (id, pos) occurrence of each duplicated window. The oracle
    * replays windows → keeper rank → cut-interval union independently
    * and stitches the survivor text with complement segments +
    * `string_agg` (a deliberately different spelling from the Scala
    * fold), so the full reconstructed text is hash-checked.
    */
  private def q134(s: SparkSession, d: String): DataFrame =
    graft.operators.ExactSubstr.cutDuplicateSpans(
      Tables.documents(s, d), "doc_id", "text", minLen = 50)

  val defs: Map[String, Q] = Map(
    "q105_span_dedup" -> q105,
    "q106_quality_audit" -> q106,
    "q107_anomaly_mad" -> q107,
    "q108_bpe_pairs" -> q108,
    "q116_blocklist_scan" -> q116,
    "q119_url_canonical" -> q119,
    "q133_dup_substr_spans" -> q133,
    "q134_dup_substr_cut" -> q134)

  val oracles: Map[String, String] = Map(
    "q133_dup_substr_spans" ->
      """WITH w AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS pos,
        |    unhex(md5(substring(text, CAST(i AS INTEGER), 50))) AS h
        |  FROM documents, unnest(range(1, length(text) - 50 + 2)) AS t(i)
        |  WHERE length(text) >= 50),
        |d AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS cnt FROM w)
        |  WHERE cnt >= 2),
        |g AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 50
        |      THEN 1 ELSE 0 END AS gap
        |  FROM d),
        |isl AS (
        |  SELECT doc_id, pos,
        |    sum(gap) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM g)
        |SELECT doc_id, min(pos) AS span_start, max(pos) + 49 AS span_end,
        |  max(pos) + 49 - min(pos) + 1 AS span_len
        |FROM isl GROUP BY doc_id, grp""".stripMargin,
    "q134_dup_substr_cut" ->
      // shared CTE chain with the fused pipeline q150 (CutOracleSql —
      // the factored-prefix rule: one replay spelling, two consumers)
      s"""WITH ${CutOracleSql.ctes(minLen = 50)}
         |SELECT doc_id, text AS text_dedup, n_spans_cut, n_chars_cut
         |FROM cutdocs""".stripMargin,
    "q119_url_canonical" ->
      // independent canonicalization: regexp surgery on the raw string
      // (DuckDB has no parse_url), same rules
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id%2=0 THEN 'https://' ELSE 'http://' END) ||
        |    (CASE WHEN doc_id%3=0 THEN 'www.' ELSE '' END) ||
        |    (CASE WHEN doc_id%7=0 THEN upper(source) ELSE source END) ||
        |    '.example.com' ||
        |    (CASE WHEN doc_id%2=0 AND doc_id%11=0 THEN ':443' ELSE '' END) ||
        |    '/articles/' || CAST(doc_id//10 AS VARCHAR) ||
        |    (CASE WHEN doc_id%5=0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id%4=0 THEN '?utm_source=feed' ||
        |       (CASE WHEN doc_id%8=0
        |        THEN '&page=' || CAST((doc_id//8)%5 AS VARCHAR) ELSE '' END)
        |     ELSE '' END) ||
        |    (CASE WHEN doc_id%6=0 THEN '#s2' ELSE '' END) AS raw
        |  FROM documents),
        |parts AS (
        |  SELECT raw,
        |    regexp_replace(regexp_replace(raw, '#.*$', ''),
        |      '^[a-zA-Z]+://', '') AS hier
        |  FROM u),
        |split AS (
        |  SELECT raw,
        |    regexp_extract(hier, '^[^/?]+') AS auth,
        |    substr(hier, length(regexp_extract(hier, '^[^/?]+')) + 1) AS rest
        |  FROM parts),
        |canon AS (
        |  SELECT raw,
        |    regexp_replace(regexp_replace(lower(auth), ':[0-9]+$', ''),
        |      '^www\.', '') AS host,
        |    CASE WHEN regexp_replace(regexp_extract(rest, '^[^?]*'),
        |                             '/+$', '') = ''
        |         THEN '/'
        |         ELSE regexp_replace(regexp_extract(rest, '^[^?]*'),
        |                             '/+$', '') END AS path,
        |    array_to_string(list_filter(
        |      string_split(CASE WHEN rest LIKE '%?%'
        |        THEN regexp_replace(rest, '^[^?]*\?', '') ELSE '' END, '&'),
        |      p -> NOT starts_with(p, 'utm_')
        |           AND NOT starts_with(p, 'ref=') AND p <> ''), '&') AS qs
        |  FROM split)
        |SELECT host,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT raw) AS BIGINT) AS n_raw,
        |  CAST(count(DISTINCT host || path ||
        |    (CASE WHEN qs <> '' THEN '?' || qs ELSE '' END)) AS BIGINT)
        |    AS n_canon
        |FROM canon GROUP BY host""".stripMargin,
    "q116_blocklist_scan" ->
      """WITH pats AS (
        |  SELECT p FROM (VALUES ('table table'), ('fast merge'),
        |    ('agg row scan'), ('spark'), ('quantum')) t(p)),
        |m AS (
        |  SELECT d.doc_id, pats.p
        |  FROM documents d CROSS JOIN pats
        |  WHERE position(pats.p IN d.text) > 0)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_matched,
        |  string_agg(p, ',' ORDER BY p) AS matched
        |FROM m GROUP BY doc_id""".stripMargin,
    "q105_span_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(arr) AS token,
        |         unnest(range(len(arr))) AS pos
        |  FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents)),
        |spans AS (
        |  SELECT doc_id, CAST(floor(pos / 10) AS BIGINT) AS span_idx,
        |    string_agg(token, ' ' ORDER BY pos) AS span_text
        |  FROM toks WHERE length(token) > 0
        |  GROUP BY 1, 2),
        |flagged AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY md5(span_text) ORDER BY doc_id, span_idx) AS rn
        |  FROM spans)
        |SELECT doc_id, count(*) AS n_spans,
        |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN span_text END,
        |    ' ' ORDER BY span_idx), '') AS text_dedup
        |FROM flagged GROUP BY doc_id""".stripMargin,
    "q106_quality_audit" ->
      """WITH oa AS (
        |  SELECT count(*) AS n, count(DISTINCT o_orderkey) AS nd,
        |    sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS neg,
        |    sum(CASE WHEN o_orderstatus IN ('F','O','P') THEN 0 ELSE 1 END)
        |      AS bad_status
        |  FROM orders),
        |la AS (
        |  SELECT count(*) AS n,
        |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS null_ship,
        |    sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END)
        |      AS bad_qty
        |  FROM lineitem),
        |fk AS (
        |  SELECT count(*) AS n,
        |    sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS orphans
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey)
        |SELECT 'orders_pk_unique' AS check_name,
        |  floor(CAST(nd AS DOUBLE) / n * 1000000 + 0.50001) / 1000000 AS value,
        |  nd = n AS pass FROM oa
        |UNION ALL SELECT 'orders_price_nonneg',
        |  floor(CAST(neg AS DOUBLE) / n * 1000000 + 0.50001) / 1000000,
        |  neg = 0 FROM oa
        |UNION ALL SELECT 'orders_status_domain',
        |  floor(CAST(bad_status AS DOUBLE) / n * 1000000 + 0.50001) / 1000000,
        |  bad_status = 0 FROM oa
        |UNION ALL SELECT 'lineitem_shipdate_nonnull',
        |  floor(CAST(null_ship AS DOUBLE) / n * 1000000 + 0.50001) / 1000000,
        |  null_ship = 0 FROM la
        |UNION ALL SELECT 'lineitem_qty_range',
        |  floor(CAST(bad_qty AS DOUBLE) / n * 1000000 + 0.50001) / 1000000,
        |  bad_qty = 0 FROM la
        |UNION ALL SELECT 'lineitem_fk_orders',
        |  floor(CAST(orphans AS DOUBLE) / n * 1000000 + 0.50001) / 1000000,
        |  orphans = 0 FROM fk""".stripMargin,
    "q107_anomaly_mad" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |dev AS (
        |  SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_cont(adev, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT d.event_type, count(*) AS n,
        |  floor(any_value(d.med) * 1000000 + 0.50001) / 1000000 AS median_value,
        |  floor(any_value(m.mad) * 1000000 + 0.50001) / 1000000 AS mad,
        |  CAST(sum(CASE WHEN
        |      floor(d.adev * 1000000 + 0.50001) / 1000000 >
        |      floor(3 * 1.4826 * m.mad * 1000000 + 0.50001) / 1000000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY d.event_type""".stripMargin,
    "q108_bpe_pairs" ->
      """WITH words AS (
        |  SELECT w, count(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |  WHERE length(w) >= 2 GROUP BY w),
        |pairs AS (
        |  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, freq
        |  FROM (SELECT w, freq, unnest(range(1, length(w))) AS i FROM words)),
        |counted AS (
        |  SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
        |  FROM pairs GROUP BY pair),
        |ranked AS (
        |  SELECT pair, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, pair) AS rank
        |  FROM counted)
        |SELECT pair, cnt, rank FROM ranked WHERE rank <= 50""".stripMargin)
}
