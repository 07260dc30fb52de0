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
