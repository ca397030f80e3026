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
  */
object UrlOps {

  /** Canonical host: lowercased, no port, no leading `www.`. */
  def canonicalHost(raw: Column): Column =
    regexp_replace(lower(expr_parse(raw, "HOST")), "^www\\.", "")

  /** Full canonical URL (host + path + surviving query), schemeless —
    * http/https variants of the same resource collapse.
    */
  def canonicalUrl(raw: Column): Column = {
    val path0 = coalesce(expr_parse(raw, "PATH"), lit("/"))
    // strip trailing slashes but keep the bare root
    val path = when(regexp_replace(path0, "/+$", "") === "", lit("/"))
      .otherwise(regexp_replace(path0, "/+$", ""))
    val qs = coalesce(expr_parse(raw, "QUERY"), lit(""))
    val kept = filter(
      split(qs, "&"),
      p => !p.startsWith("utm_") && !p.startsWith("ref=") && p =!= "")
    concat(
      canonicalHost(raw), path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  private def expr_parse(raw: Column, part: String): Column =
    call_function("parse_url", raw, lit(part))
}
