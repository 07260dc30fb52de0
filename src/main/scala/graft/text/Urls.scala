package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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
    * The cheap zero-join heuristic; [[registeredDomainsPsl]] is the
    * full-Public-Suffix-List path behind the same output contract.
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

  /** One Public Suffix List rule, stored VERBATIM (wildcard rules keep
    * their `*.` prefix; exception rules drop the `!` into the flag):
    * `labels` is the rule's label count (the `*` counts as one).
    */
  final case class PslRule(rkey: String, rlabels: Int, rexc: Boolean)

  /** The full Mozilla Public Suffix List, parsed from the vendored
    * `public_suffix_list.dat` classpath resource (publicsuffix.org,
    * MPL 2.0 — ICANN + PRIVATE sections both included, so e.g.
    * `alice.github.io` is its own registrable domain, the behavior
    * per-site crawl caps want). ~9.5k rules: comments/blank lines
    * dropped, entries lowercased, kept verbatim otherwise.
    */
  lazy val pslRules: Seq[PslRule] = {
    val in = getClass.getResourceAsStream("/public_suffix_list.dat")
    require(in != null, "public_suffix_list.dat missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines()
        // Locale.ROOT: a Turkish-default-locale JVM would dot-map 'I'
        // differently from Spark's locale-independent lower(), breaking
        // the fixture bit-equality contract on a future PSL refresh
        .map(_.trim.toLowerCase(java.util.Locale.ROOT))
        .filter(l => l.nonEmpty && !l.startsWith("//"))
        .map { l =>
          val exc = l.startsWith("!")
          val key = if (exc) l.substring(1) else l
          PslRule(key, key.count(_ == '.') + 1, exc)
        }
        .toVector
    } finally src.close()
  }

  /** Registered domain for every DISTINCT host via the FULL PSL —
    * longest-match semantics per publicsuffix.org's algorithm:
    * a rule matches when its labels suffix the host's (`*` consuming
    * exactly one label); a matching exception rule wins outright and
    * its public suffix is the rule minus the leftmost label; otherwise
    * the longest match prevails, defaulting to `*` (the bare TLD).
    * Registered domain = public suffix + one more label; hosts that ARE
    * a public suffix, single labels, and IPs pass through unchanged
    * (the [[registeredDomain]] contract).
    *
    * Input: any frame with `hostCol`. Output: (host, registered_domain)
    * for each distinct host — join it back, or feed per-domain caps
    * directly. The `host` column is the input value VERBATIM (so a
    * join-back never misses on case), and `registered_domain` keeps the
    * input's casing too — rule matching alone happens on the lowered
    * form, the same never-rewrites-case contract as the heuristic
    * [[registeredDomain]]. Scale shape: distinct hosts × (≤2 candidate forms per
    * label: the exact suffix and its `*.`-starred variant) explode off
    * the scan, broadcast-join the ~9.5k-row rule table, and fold back
    * to one row per host with one partial-agg shuffle on the host —
    * never a corpus-sized regex or a rules-sized theta join. The rule
    * table parses driver-side once and ships as ONE broadcast.
    */
  def registeredDomainsPsl(hosts: DataFrame,
                           hostCol: String = "host"): DataFrame = {
    val spark = hosts.sparkSession
    import spark.implicits._
    val rules = broadcast(pslRules.toDF("rkey", "rlabels", "rexc"))
    // hosts kept VERBATIM; the rule match runs once per distinct
    // LOWERED form and joins back, so case-variant inputs share one
    // match pass and none is ever dropped or rewritten
    val hp = hosts.select(col(hostCol).as("host")).distinct()
      .withColumn("lhost", lower(col("host")))
    val lh = hp.select(col("lhost")).distinct()
      .withColumn("lparts", split(col("lhost"), "\\."))
      .withColumn("n", size(col("lparts")))
    val ks = lh.select(col("lhost"), col("lparts"), col("n"),
      explode(expr("sequence(1, n)")).as("k"))
    // candidate forms: the host's last-k-label suffix, and (k ≥ 2) that
    // suffix with its leftmost label replaced by '*' — so VERBATIM rule
    // keys match both concrete and wildcard rules in ONE equi-join
    val cand = ks.select(col("lhost"), col("k"),
        array_join(slice(col("lparts"), col("n") - col("k") + 1, col("k")),
          ".").as("form"))
      .unionByName(ks.where(col("k") >= 2).select(col("lhost"), col("k"),
        concat(lit("*."),
          array_join(slice(col("lparts"), col("n") - col("k") + 2,
            col("k") - 1), ".")).as("form")))
    val ps = cand.join(rules, cand("form") === rules("rkey"), "left")
      .groupBy("lhost")
      .agg(coalesce(
        min(when(col("rexc"), col("k") - 1)),
        max(when(!col("rexc"), col("k"))),
        lit(1)).as("ps"))
    // slice the ORIGINAL host's labels with the ps resolved on the
    // lowered form: registered_domain preserves input casing
    hp.join(ps, "lhost")
      .withColumn("parts", split(col("host"), "\\."))
      .withColumn("n", size(col("parts")))
      .select(col("host"),
        when(col("host").rlike("^[0-9.]+$") || col("n") <= col("ps"),
          col("host"))
          .otherwise(array_join(
            slice(col("parts"), col("n") - col("ps"), col("ps") + 1), "."))
          .as("registered_domain"))
  }
}
