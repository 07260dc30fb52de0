package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-corpus identity key.
  *
  * A crawl sees the same page as `HTTPS://Host.COM:443/p?b=2&a=1`,
  * `https://host.com/p?a=1&utm_source=feed&b=2#frag`, and
  * `https://user@host.com./p?b=2&a=1&gclid=x`; byte-keyed URL dedup (the
  * reference's Text-equality world, `src/core/org/apache/hadoop/io/Text.java`)
  * treats those as three pages. This canonical form — lowercase
  * scheme/host, userinfo stripped, default port dropped, trailing host
  * dot dropped, empty path → `/`, fragment dropped, tracking params
  * removed, remaining params sorted — is the key per-domain caps, URL
  * frontier dedup and dedup-savings reports group on.
  *
  * Everything is codegen'd Column ops (regex + array HOFs) in the
  * Java-regex/RE2 common subset, so oracle SQL replays the exact same
  * patterns; the whole transform rides the scan, no shuffle, no UDF.
  * Percent-decoding is deliberately NOT applied: `%2F` in a path is not
  * a slash, and decoding changes identity — the conservative key only
  * normalizes what RFC 3986 §6 calls syntax-based (always-safe)
  * normalizations, plus the tracking-param strip.
  */
object Urls {

  /** Tracking params that never change content identity. Anchored match
    * against one `k=v` (or bare `k`) query segment.
    */
  val TrackingParamRe =
    "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_cid|mc_eid|ref)(=|$)"

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val AuthorityRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val QueryRe = "\\?([^#]*)"

  def scheme(u: Column): Column = lower(regexp_extract(u, SchemeRe, 1))

  /** Lowercased host, userinfo and port stripped, trailing dot dropped. */
  def host(u: Column): Column = {
    val hp = regexp_replace(lower(regexp_extract(u, AuthorityRe, 1)),
      "^[^@]*@", "")
    regexp_replace(regexp_replace(hp, ":[0-9]*$", ""), "\\.$", "")
  }

  private def port(u: Column): Column = {
    val hp = regexp_replace(lower(regexp_extract(u, AuthorityRe, 1)),
      "^[^@]*@", "")
    regexp_extract(hp, ":([0-9]+)$", 1)
  }

  /** Sorted non-tracking query segments, rejoined — "" when none. */
  def canonicalQuery(u: Column): Column = {
    val q = regexp_extract(u, QueryRe, 1)
    val params = filter(split(q, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))
    array_join(array_sort(params), "&")
  }

  def canonicalizeUrl(u: Column): Column = {
    val s = scheme(u)
    val p = port(u)
    val portPart = when(p === ""
        || (s === "http" && p === "80")
        || (s === "https" && p === "443"), lit(""))
      .otherwise(concat(lit(":"), p))
    val rawPath = regexp_extract(u, PathRe, 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val q = canonicalQuery(u)
    concat(s, lit("://"), host(u), portPart, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Multi-label public suffixes the two-label heuristic would split
    * wrong. A handful of common ones, not the PSL — the seam where a
    * deployment drops in the full list (a broadcast lookup at worst).
    */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "com.au", "net.au",
    "co.jp", "or.jp", "com.br", "co.in", "co.kr", "com.cn")

  /** Registered domain (site identity for per-domain caps): the last two
    * host labels, or three when the last two are a known multi-part
    * public suffix. IPs and single-label hosts pass through unchanged.
    */
  def registeredDomain(hostCol: Column): Column = {
    val parts = split(hostCol, "\\.")
    val n = size(parts)
    val lastTwo = concat_ws(".",
      element_at(parts, -2), element_at(parts, -1))
    val isIp = hostCol.rlike("^[0-9.]+$")
    when(isIp || n <= 2, hostCol)
      .when(lastTwo.isin(MultiPartSuffixes: _*),
        concat_ws(".", element_at(parts, -3), lastTwo))
      .otherwise(lastTwo)
  }
}
