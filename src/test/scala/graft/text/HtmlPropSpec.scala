package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property invariants of the extraction pipeline over GENERATED pages:
  * content words survive in order, dropped-container words vanish, and
  * main-text equals full extraction when no block is link-dense. Raw
  * ScalaCheck with fixed seeds (SpecPropertiesSpec convention).
  */
class HtmlPropSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(2400L + i)))

  private val word: Gen[String] =
    Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  private val blockTag: Gen[String] =
    Gen.oneOf("p", "div", "li", "h2", "blockquote", "section")
  private val inlineTag: Gen[String] = Gen.oneOf("b", "i", "span", "em")

  /** One paragraph: words, some wrapped in an inline tag. */
  private val para: Gen[(String, Seq[String])] = for {
    ws <- Gen.nonEmptyListOf(word).map(_.take(12))
    it <- inlineTag
    wrapped = ws.zipWithIndex.map { case (w, i) =>
      if (i % 3 == 1) s"<$it>$w</$it>" else w
    }
  } yield (wrapped.mkString(" "), ws)

  /** A page: title + paragraphs in random block tags, with script /
    * comment noise (content prefixed "zz" so leakage is detectable)
    * interleaved between blocks.
    */
  private val page: Gen[(String, Seq[String])] = for {
    title <- Gen.nonEmptyListOf(word).map(_.take(4))
    paras <- Gen.nonEmptyListOf(para).map(_.take(6))
    tags <- Gen.listOfN(paras.length, blockTag)
    noise <- Gen.listOfN(paras.length, Gen.oneOf(
      "<script>var zzJunk = 1;</script>", "<!-- zzComment -->",
      "<style>.zz { color: red }</style>", ""))
  } yield {
    val body = paras.zip(tags).zip(noise).map { case (((html, _), t), nz) =>
      s"<$t>$html</$t>$nz"
    }.mkString
    val expected = title ++ paras.flatMap(_._2)
    (s"<html><head><title>${title.mkString(" ")}</title></head>" +
      s"<body>$body</body></html>", expected)
  }

  test("content words survive in order; dropped-container words vanish") {
    import spark.implicits._
    val cases = samples(page, 60)
    val df = cases.map(_._1).toDF("h")
      .select(col("h"), Html.htmlExtract(col("h")).as("e"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (html, expected) =>
      val toks = got(html).split("\\s+").filter(_.nonEmpty).toSeq
      assert(toks == expected, s"token drift on: ${html.take(120)}")
      Seq("zzJunk", "zzComment", "color: red").foreach(marker =>
        assert(!got(html).contains(marker),
          s"dropped-container content leaked: $marker"))
    }
  }

  test("main text ≡ full extraction when no block is link-dense") {
    import spark.implicits._
    val cases = samples(page, 40).map(_._1)
    val rows = cases.toDF("h")
      .select(Html.htmlExtract(col("h")).as("e"),
        Html.htmlMainText(col("h")).as("m"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }
}
