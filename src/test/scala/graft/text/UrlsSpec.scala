package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {

  private def canon(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u").select(Urls.canonicalizeUrl(col("u"))).head().getString(0)
  }

  private def regdom(h: String): String = {
    import spark.implicits._
    Seq(h).toDF("h").select(Urls.registeredDomain(col("h"))).head().getString(0)
  }

  test("messy spellings of the same page collapse to one canonical form") {
    val expect = "https://example.com/a/7?a=1&b=2"
    assert(canon("HTTPS://Example.COM:443/a/7?b=2&a=1") == expect)
    assert(canon("https://example.com/a/7?a=1&utm_source=feed&b=2#frag") == expect)
    assert(canon("https://user@example.com./a/7?b=2&a=1&gclid=xyz") == expect)
  }

  test("default ports drop per scheme; non-default ports survive") {
    assert(canon("http://h.com:80/x") == "http://h.com/x")
    assert(canon("https://h.com:443/x") == "https://h.com/x")
    assert(canon("http://h.com:8080/x") == "http://h.com:8080/x")
    // 443 is NOT http's default port
    assert(canon("http://h.com:443/x") == "http://h.com:443/x")
  }

  test("empty path becomes /; fragment always drops; empty query drops") {
    assert(canon("https://h.com") == "https://h.com/")
    assert(canon("https://h.com#top") == "https://h.com/")
    assert(canon("https://h.com/p?") == "https://h.com/p")
    assert(canon("https://h.com/p?utm_campaign=x") == "https://h.com/p")
  }

  test("bare tracking flags (no =) are stripped; lookalikes survive") {
    assert(canon("https://h.com/p?ref&a=1") == "https://h.com/p?a=1")
    // 'refresh=1' must NOT match the anchored 'ref(=|$)' rule
    assert(canon("https://h.com/p?refresh=1") == "https://h.com/p?refresh=1")
    // percent-encoding is preserved, not decoded
    assert(canon("https://h.com/a%2Fb?x=%20") == "https://h.com/a%2Fb?x=%20")
  }

  test("registered domain: two-label default, multi-part suffixes, IPs") {
    assert(regdom("www.news.example.com") == "example.com")
    assert(regdom("a.b.site.co.uk") == "site.co.uk")
    assert(regdom("example.com") == "example.com")
    assert(regdom("localhost") == "localhost")
    assert(regdom("192.168.0.1") == "192.168.0.1")
  }

  private def pslDoms(hs: String*): Map[String, String] = {
    import spark.implicits._
    Urls.registeredDomainsPsl(hs.toDF("host"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("PSL registered domain: every rule class of the full list") {
    val m = pslDoms(
      "www.news.example.com",   // plain TLD rule
      "a.b.site.co.uk",         // multi-label ICANN rule
      "b.ck",                   // *.ck wildcard: host IS a public suffix
      "a.b.ck",                 // *.ck wildcard: one label above
      "www.ck",                 // !www.ck exception: itself registrable
      "sub.www.ck",             // exception wins over the wildcard
      "blog.alice.github.io",   // PRIVATE-section rule
      "deep.foo.bar.unknowntld",// implicit * default rule
      "localhost",              // single label passes through
      "192.168.0.1",            // IP passes through
      "co.uk")                  // host IS a (concrete) public suffix
    assert(m("www.news.example.com") == "example.com")
    assert(m("a.b.site.co.uk") == "site.co.uk")
    assert(m("b.ck") == "b.ck")
    assert(m("a.b.ck") == "a.b.ck")
    assert(m("www.ck") == "www.ck")
    assert(m("sub.www.ck") == "www.ck")
    assert(m("blog.alice.github.io") == "alice.github.io")
    assert(m("deep.foo.bar.unknowntld") == "bar.unknowntld")
    assert(m("localhost") == "localhost")
    assert(m("192.168.0.1") == "192.168.0.1")
    assert(m("co.uk") == "co.uk")
  }

  test("PSL agrees with the heuristic on its whole suffix list") {
    // every MultiPartSuffixes entry is a real PSL rule, and a host one
    // label above it resolves identically through both paths
    import spark.implicits._
    val hosts = Urls.MultiPartSuffixes.map(sfx => s"www.site.$sfx")
    val heur = hosts.toDF("h")
      .select(col("h"), Urls.registeredDomain(col("h")).as("rd"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val psl = pslDoms(hosts: _*)
    hosts.foreach(h => assert(psl(h) == heur(h), s"mismatch on $h"))
  }

  test("committed PSL fixture is bit-equal to the classpath parse") {
    // the DuckDB oracle replays matching over fixtures/psl_rules.parquet;
    // this pins that file to what the library actually parses — a PSL
    // refresh without a fixture regen (or vice versa) fails here
    val fixture = spark.read.parquet("fixtures/psl_rules.parquet")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getBoolean(2)))
      .toSeq.sorted
    val parsed = Urls.pslRules
      .map(r => (r.rkey, r.rlabels, r.rexc)).sorted
    assert(parsed.size == fixture.size)
    assert(parsed == fixture)
  }

  test("canonicalization is idempotent") {
    val urls = Seq(
      "HTTPS://Example.COM:443/a/7?b=2&a=1",
      "http://h.com:8080/x?z=1&y=2#f",
      "https://user@example.com./")
    for (u <- urls) assert(canon(canon(u)) == canon(u), s"not idempotent: $u")
  }

  test("property: any permutation of query params canonicalizes identically") {
    val params = Seq("a=1", "b=2", "c=3", "utm_source=x", "gclid=y")
    val rnd = new scala.util.Random(7)
    val expect = canon(s"https://h.com/p?${params.mkString("&")}")
    for (_ <- 1 to 8) {
      val perm = rnd.shuffle(params).mkString("&")
      assert(canon(s"https://h.com/p?$perm") == expect, s"perm $perm diverged")
    }
    assert(expect == "https://h.com/p?a=1&b=2&c=3")
  }

  test("property: host case, default port, userinfo and fragment are a " +
    "16-variant equivalence class") {
    val hosts = Seq("h.com", "H.COM", "h.Com.", "user:pw@h.com")
    val tails = Seq("", ":443", "#frag", ":443#frag")
    val forms = for (h <- hosts; t <- tails)
      yield s"https://$h${t.takeWhile(_ != '#')}/p${t.dropWhile(_ != '#')}"
    val keys = forms.map(canon).toSet
    assert(keys == Set("https://h.com/p"), s"got $keys")
  }
}
