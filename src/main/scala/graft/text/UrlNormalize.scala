package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the standard pre-dedup step of a web-corpus
  * pipeline (two crawls of the same page differ only in case, default
  * ports, tracking params, fragments, and trailing slashes; canonical-form
  * equality collapses them before any content hashing runs).
  *
  * Canonical form:
  *   - scheme and host lowercased (path/query case is significant and kept)
  *   - default ports stripped (`:80` for http, `:443` for https)
  *   - fragment dropped
  *   - tracking params dropped (`utm_*`, `fbclid`, `gclid`)
  *   - surviving query params sorted bytewise (param order is transport
  *     noise); empty query → no `?`
  *   - trailing slashes stripped from the path (root collapses to empty)
  *
  * Pure Column programs over codegen'd regexp/array functions — map-only,
  * no UDF, no shuffle; every rule replays in DuckDB (q137).
  */
object UrlNormalize {

  private val TrackingParam = "^(utm_[^=]*|fbclid|gclid)(=.*)?$"

  /** Lowercased scheme, e.g. `https`. */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host WITHOUT the port. */
  def host(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1))

  /** Port string if present (`"443"`), else empty. */
  def port(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]*:([0-9]+)", 1)

  /** Path with trailing slashes stripped (root → empty). Case preserved. */
  def path(url: Column): Column =
    regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")

  /** Sorted, tracking-free query string (no leading `?`), empty if none
    * survives.
    */
  def cleanQuery(url: Column): Column = {
    val raw = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = filter(split(raw, "&"),
      p => length(p) > 0 && !p.rlike(TrackingParam))
    when(raw === "", lit("")).otherwise(array_join(array_sort(kept), "&"))
  }

  /** Full canonical URL under the rules above. */
  def canonicalUrl(url: Column): Column = {
    val sch = scheme(url)
    val prt = port(url)
    // keep a non-default port; drop 80/http and 443/https
    val keptPort = when(
      prt === "" || (sch === "http" && prt === "80") ||
        (sch === "https" && prt === "443"), lit(""))
      .otherwise(concat(lit(":"), prt))
    val q = cleanQuery(url)
    concat(sch, lit("://"), host(url), keptPort, path(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }
}
