package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation: collapse the raw-URL
  * variants that name the same resource before URL-level dedup or
  * per-host aggregation (caps, crawl budgeting, robots grouping).
  *
  * Rules (the standard web-pipeline set):
  *   - case-insensitive scheme + host (paths stay case-sensitive),
  *   - default/explicit port dropped,
  *   - leading `www.` dropped,
  *   - fragment dropped,
  *   - trailing slash dropped (except the bare root path),
  *   - tracking query params dropped (`utm_*`, `ref=`), everything else
  *     kept in original order.
  *
  * Everything is built from codegen'd expressions (`parse_url`, array
  * HOFs) — per-row string work that runs map-side at any scale; no UDF,
  * no shuffle. `parse_url` follows java.net.URL semantics: HOST excludes
  * the port and QUERY excludes the fragment, so both rules come free.
  *
  * `parse_url` lowers to an interpreted `Invoke(ParseUrlEvaluator)` —
  * the most expensive node in any plan that uses it — so the API is
  * split in two layers:
  *   - [[parsedHost]]/[[parsedPath]]/[[parsedQuery]] call `parse_url`
  *     ONCE each; project them in their own prior `select` so each raw
  *     URL is parsed exactly three times total. `CollapseProject` will
  *     not re-inline them into downstream uses because an `Invoke` is
  *     not a cheap expression (it never duplicates non-cheap aliases
  *     that are referenced more than once).
  *   - [[hostFromParsed]]/[[urlFromParsed]] do the pure-string
  *     canonicalization over those components.
  * The one-column conveniences [[canonicalHost]]/[[canonicalUrl]]
  * remain for single-use call sites, but a query that needs BOTH host
  * and canonical URL must hoist (q119 did not, and `parse_url` ran
  * five times per row — the suite's slowest query until fixed).
  */
object UrlOps {

  /** Raw HOST component — one `parse_url` invocation. */
  def parsedHost(raw: Column): Column = expr_parse(raw, "HOST")

  /** Raw PATH component — one `parse_url` invocation. */
  def parsedPath(raw: Column): Column = expr_parse(raw, "PATH")

  /** Raw QUERY component — one `parse_url` invocation. */
  def parsedQuery(raw: Column): Column = expr_parse(raw, "QUERY")

  /** Canonical host from a pre-parsed HOST: lowercased, no port (HOST
    * already excludes it), no leading `www.`.
    */
  def hostFromParsed(host: Column): Column =
    regexp_replace(lower(host), "^www\\.", "")

  /** Full canonical URL from pre-parsed components. `canonHost` must be
    * the output of [[hostFromParsed]] (passed in, not recomputed, so a
    * caller projecting both pays for the host canonicalization once).
    */
  def urlFromParsed(canonHost: Column, path: Column, query: Column): Column = {
    val path0 = coalesce(path, lit("/"))
    // strip trailing slashes but keep the bare root
    val canonPath = when(regexp_replace(path0, "/+$", "") === "", lit("/"))
      .otherwise(regexp_replace(path0, "/+$", ""))
    val qs = coalesce(query, lit(""))
    val kept = filter(
      split(qs, "&"),
      p => !p.startsWith("utm_") && !p.startsWith("ref=") && p =!= "")
    concat(
      canonHost, canonPath,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /** Canonical host straight from the raw URL — single-use convenience;
    * parses once.
    */
  def canonicalHost(raw: Column): Column = hostFromParsed(parsedHost(raw))

  /** Full canonical URL straight from the raw URL — single-use
    * convenience; parses three times. Do NOT pair with
    * [[canonicalHost]] on the same column — hoist via the
    * `parsed*`/`*FromParsed` layer instead.
    */
  def canonicalUrl(raw: Column): Column =
    urlFromParsed(canonicalHost(raw), parsedPath(raw), parsedQuery(raw))

  private def expr_parse(raw: Column, part: String): Column =
    call_function("parse_url", raw, lit(part))
}
