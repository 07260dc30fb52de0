package graft.functions

import graft.SparkSpec
import graft.text.Urls
import org.apache.spark.sql.functions._

/** The scalar full-PSL registered domain ([[PslDomain]]) must agree with
  * the join-shaped [[Urls.registeredDomainsPsl]] on every rule class —
  * the two are alternative physical forms of ONE operator contract.
  */
class UrlExpressionsSpec extends SparkSpec {

  /** One host per PSL rule class, mixed casing throughout (matching runs
    * lowered; output must keep input casing verbatim).
    */
  private val battery = Seq(
    // plain gTLD, two and many labels
    "example.com", "WWW.News.Example.COM",
    // multi-label ICANN suffix
    "site.co.uk", "a.b.Site.CO.UK",
    // private-section rule: each user is its own registrable domain
    "Alice.GitHub.IO", "img.alice.github.io",
    // wildcard rule *.ck: foo.ck IS a public suffix; one more label
    // registers; the !www.ck exception registers at www.ck itself
    "foo.ck", "a.foo.ck", "x.y.Foo.CK", "www.ck", "Sub.WWW.CK",
    // pass-throughs: IPs, single labels, a bare public suffix
    "192.168.0.1", "10.0.0.255", "localhost", "CO.UK", "com",
    // unknown TLD → default * rule (bare TLD is the suffix)
    "deep.foo.unknowntld", "Deep.Foo.Example",
    // degenerate labels: empty segments must not crash or diverge
    "a..b.co.uk", ".com", "",
    // unicode + case: lowering must match Spark's lower()
    "BÜCHER.example.com")

  test("scalar PslDomain ≡ registeredDomainsPsl join path, host by host") {
    import spark.implicits._
    val hosts = battery.toDF("host")
    val viaScalar = hosts
      .select(col("host"), UrlExpressions.pslDomain(col("host"))
        .as("registered_domain"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val viaJoin = Urls.registeredDomainsPsl(hosts)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaScalar.keySet == viaJoin.keySet)
    viaScalar.keys.foreach { h =>
      assert(viaScalar(h) == viaJoin(h),
        s"host '$h': scalar ${viaScalar(h)} != join ${viaJoin(h)}")
    }
  }

  test("rule classes resolve per publicsuffix.org semantics") {
    import spark.implicits._
    val out = battery.toDF("host")
      .select(col("host"), UrlExpressions.pslDomain(col("host")).as("rd"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("WWW.News.Example.COM") == "Example.COM") // casing kept
    assert(out("a.b.Site.CO.UK") == "Site.CO.UK")
    assert(out("Alice.GitHub.IO") == "Alice.GitHub.IO") // private section
    assert(out("img.alice.github.io") == "alice.github.io")
    assert(out("foo.ck") == "foo.ck")       // IS a public suffix (*.ck)
    assert(out("a.foo.ck") == "a.foo.ck")   // suffix + one label
    assert(out("x.y.Foo.CK") == "y.Foo.CK")
    assert(out("www.ck") == "www.ck")       // !www.ck exception
    assert(out("Sub.WWW.CK") == "WWW.CK")
    assert(out("192.168.0.1") == "192.168.0.1")
    assert(out("localhost") == "localhost")
    assert(out("CO.UK") == "CO.UK")         // bare suffix passes through
    assert(out("deep.foo.unknowntld") == "foo.unknowntld") // default *
    assert(out("") == "")
  }

  test("null host → null; non-string input rejected at analysis") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("host")
      .select(UrlExpressions.pslDomain(col("host"))).head()
    assert(r.isNullAt(0))
    val err = intercept[Exception] {
      spark.range(1).select(UrlExpressions.pslDomain(col("id"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }

  test("SQL registration: graft_psl_domain is the same expression") {
    UrlExpressions.register(spark)
    import spark.implicits._
    battery.toDF("host").createOrReplaceTempView("psl_hosts")
    val viaSql = spark.sql(
      "SELECT graft_psl_domain(host) AS rd FROM psl_hosts ORDER BY rd")
      .collect().map(_.getString(0)).toSeq
    val viaCol = battery.toDF("host")
      .select(UrlExpressions.pslDomain(col("host")).as("rd"))
      .orderBy("rd").collect().map(_.getString(0)).toSeq
    assert(viaSql == viaCol)
  }
}
