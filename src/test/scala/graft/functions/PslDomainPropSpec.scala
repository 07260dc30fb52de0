package graft.functions

import graft.SparkSpec
import graft.text.Urls
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property equivalence of the two full-PSL paths: [[PslDomain]] (scalar,
  * jar-resident index) and [[Urls.registeredDomainsPsl]] (broadcast-join,
  * the oracle-certified shape) must agree on GENERATED hosts — label
  * counts 1–6 drawn across every PSL rule class, random casing, dotted
  * quads, empty labels — not just the hand-picked battery. Fixed seeds
  * (raw ScalaCheck, same convention as SpecPropertiesSpec).
  */
class PslDomainPropSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1300L + i)))

  private val label: Gen[String] = for {
    s <- Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaNumChar,
        1 -> Gen.const('-'))).map(_.mkString))
  } yield s

  /** Suffix pools spanning the rule classes: plain gTLD, multi-label
    * ICANN, PRIVATE section, wildcard `*.ck`, exception `!www.ck`,
    * unknown TLD (implicit `*`), and a bare public suffix.
    */
  private val suffix: Gen[String] = Gen.oneOf(
    "com", "org", "co.uk", "org.uk", "github.io", "ck", "www.ck",
    "foo.ck", "unknowntld", "co.jp", "blogspot.com", "s3.amazonaws.com")

  private val host: Gen[String] = Gen.frequency(
    8 -> (for {
      nsub <- Gen.choose(0, 3)
      subs <- Gen.listOfN(nsub, label)
      sfx <- suffix
    } yield (subs :+ sfx).mkString(".")),
    1 -> Gen.listOfN(4, Gen.choose(0, 255)).map(_.mkString(".")),
    1 -> label,
    // degenerate: empty labels somewhere in the chain
    1 -> (for { a <- label; sfx <- suffix } yield s"$a..$sfx"))

  /** Random per-char case flip, so matching (lowered) and output
    * (verbatim) casing are exercised independently.
    */
  private val casedHost: Gen[String] = for {
    h <- host
    flips <- Gen.listOfN(h.length, Gen.oneOf(true, false))
  } yield h.zip(flips).map { case (c, f) =>
    if (f) c.toUpper else c.toLower
  }.mkString

  test("scalar ≡ join path on 300 generated hosts across rule classes") {
    import spark.implicits._
    val hosts = samples(casedHost, 300).distinct
    assert(hosts.size > 200) // the generator actually produced variety
    val df = hosts.toDF("host")
    val scalar = df.select(col("host"),
        UrlExpressions.pslDomain(col("host")).as("rd"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val joined = Urls.registeredDomainsPsl(df)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(scalar.keySet == joined.keySet)
    val diffs = scalar.keys.filter(h => scalar(h) != joined(h))
    assert(diffs.isEmpty,
      diffs.take(5).map(h =>
        s"'$h': scalar=${scalar(h)} join=${joined(h)}").mkString("; "))
  }

  test("structural invariants: output is a dot-suffix preserving case") {
    import spark.implicits._
    val hosts = samples(casedHost, 200).distinct
    val out = hosts.toDF("host")
      .select(col("host"), UrlExpressions.pslDomain(col("host")).as("rd"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    out.foreach { case (h, rd) =>
      // the registered domain is always a label-suffix of the input,
      // casing intact — never a rewrite
      assert(h == rd || h.endsWith("." + rd),
        s"'$rd' is not a label-suffix of '$h'")
    }
  }
}
