package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Html.htmlExtract(col("h"))).head().getString(0)
  }

  private def main(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Html.htmlMainText(col("h"))).head().getString(0)
  }

  test("scripts, styles, noscript and comments vanish WITH their content") {
    val h = "<p>keep</p><script>var x = '<p>not text</p>';</script>" +
      "<style>p { color: red }</style><noscript>enable js</noscript>" +
      "<!-- secret --><p>also keep</p>"
    assert(extract(h) == "keep\nalso keep")
  }

  test("block tags segment lines; inline tags melt into spaces") {
    val h = "<div>one <b>bold</b> word</div><ul><li>a</li><li>b</li></ul>" +
      "<h2>head</h2><p>text with <span>span</span> and <a href=\"/x\">a link</a>.</p>"
    assert(extract(h) == "one bold word\na\nb\nhead\ntext with span and a link .")
  }

  test("entities decode AFTER whitespace collapse; &amp; decodes last") {
    assert(extract("<p>a &lt;tag&gt; &quot;q&quot; it&#39;s&nbsp;here</p>")
      == "a <tag> \"q\" it's here")
    // &amp;lt; is the TEXT "&lt;", not a <
    assert(extract("<p>literal &amp;lt; stays</p>") == "literal &lt; stays")
  }

  test("case-insensitive tags, multiline content, attribute soup") {
    val h = "<SCRIPT type=\"text/javascript\">\nmulti\nline\n</SCRIPT>" +
      "<P CLASS=\"x\" data-y=\"z\">para</P>\n<BR/>tail"
    assert(extract(h) == "para\ntail")
  }

  test("raw '<' inside an attribute splits the tag — fail-open as text") {
    // '<' is excluded from attribute spans ([^<>]*, not [^>]*) to keep
    // the Java engine linear on tag soup (the 81s-vs-2ms cliff pinned by
    // the adversarial test); the documented cost is this rare shape,
    // whose head survives as text instead of text being eaten
    assert(extract("<p data-y=\"<\">x</p>") == "<p data-y=\" x")
  }

  test("main text: link-dense blocks die, content survives") {
    val nav = "<nav><a href=\"/\">Home</a> <a href=\"/t\">Tags</a></nav>"
    val para = "<p>" + ("real content sentence. " * 5).trim + "</p>"
    val linkedPara = "<p>See <a href=\"/ref\">the reference docs</a> for " +
      "a full discussion of this behavior in context.</p>"
    val footer = "<footer><a href=\"/a\">A</a> <a href=\"/b\">B</a></footer>"
    val out = main(nav + para + linkedPara + footer)
    assert(!out.contains("Home"))
    assert(!out.toLowerCase.contains("tags"))
    assert(out.contains("real content sentence."))
    // one anchor over >40 chars of text → kept
    assert(out.contains("the reference docs"))
    assert(!out.endsWith("A B"))
    // extract keeps everything main drops
    val all = extract(nav + para + linkedPara + footer)
    assert(all.contains("Home"))
    assert(all.contains("A B"))
  }

  test("uppercase, tab-separated and attribute-less anchors are counted") {
    // an uppercase nav bar must die exactly like its lowercase twin
    val upNav = "<nav><A HREF=\"/\">Home</A> <A HREF=\"/t\">Tags</A> " +
      "<A HREF=\"/a\">About</A></nav><p>" +
      ("plain prose sentence here. " * 4).trim + "</p>"
    val um = main(upNav)
    assert(!um.contains("Home") && um.contains("plain prose"))
    // minified (<a>) and tab-separated (<a\t) forms count too
    val minified = "<div><a>x</a>\t<a\thref=\"/y\">y</a> <a>z</a></div>" +
      "<p>real paragraph content long enough to clear the gate easily.</p>"
    val mm = main(minified)
    assert(!mm.contains("x") || mm.startsWith("real"),
      s"minified anchors slipped the gate: $mm")
    assert(mm.contains("real paragraph content"))
    // the flip case: 54 chars over one lowercase + one UPPERCASE anchor
    // — both counted → needs 80 → dropped (a lowercase-only count would
    // see 1 anchor, need 40, and wrongly keep it)
    val mixed = "<p>Extra: <A HREF=\"/arc\">the full archive of older " +
      "articles</A> and <a href=\"/m\">a mirror</a></p>"
    assert(main(mixed) == "")
    assert(extract(mixed).startsWith("Extra:"))
  }

  test("numeric character references decode via the literal table") {
    assert(extract("<p>it&#8217;s &#8212; fine</p>") == "it’s — fine")
    assert(extract("<p>&#34;q&#34; &#60;tag&#62; a&#160;b &#169; &#8230;</p>")
      == "\"q\" <tag> a b © …")
    assert(extract("<p>hex&#x27;s &#x2019;curly&#x2019;</p>")
      == "hex's ’curly’")
    assert(extract("<p>dash &mdash; ndash &ndash; more&hellip;</p>")
      == "dash — ndash – more…")
    // &amp;#8217; is the TEXT "&#8217;": the numeric pass runs BEFORE
    // the ampersand decode, so it is not double-decoded
    assert(extract("<p>literal &amp;#8217; stays</p>")
      == "literal &#8217; stays")
  }

  test("mainBlocksKept counts exactly the gate survivors") {
    import spark.implicits._
    val h = "<nav><a href=\"/\">x</a><a href=\"/\">y</a></nav>" +
      "<p>long enough paragraph of plain prose to survive</p><p>two</p>"
    val n = Seq(h).toDF("h")
      .select(Html.mainBlocksKept(col("h"))).head().getInt(0)
    assert(n == 2)
  }

  test("null html → null; empty html → empty") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("h")
      .select(Html.htmlExtract(col("h")), Html.htmlMainText(col("h"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(extract("") == "")
    assert(main("") == "")
  }

  test("adversarial tag soup: linear, terminating, never throws") {
    import spark.implicits._
    // the classic regex-cliff shapes: an unclosed <script with a MB of
    // text after it (lazy .*? must fail fast, not backtrack), a MB of
    // bare '<' (no '>' ever arrives), deep "nesting", huge attributes
    val unclosedScript = "<script>" + ("x " * 500000)
    val bareLt = "<" * 1000000
    val deep = "<div>" * 20000 + "core" + "</div>" * 20000
    val hugeAttr = "<p " + ("a=\"v\" " * 100000) + ">attr-soup</p>"
    val t0 = System.nanoTime()
    val rows = Seq(unclosedScript, bareLt, deep, hugeAttr).toDF("h")
      .select(Html.htmlExtract(col("h")).as("e"),
        Html.htmlMainText(col("h")).as("m"))
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30.0, f"adversarial extraction took $secs%.1f s")
    assert(rows.length == 4 && rows.forall(r => !r.isNullAt(0)))
    // unclosed <script> never finds its close: the tag strips, the text
    // survives (fail-open — a truncation bug would silently eat pages)
    assert(rows(0).getString(0).startsWith("x x"))
    assert(rows(2).getString(0) == "core")
    assert(rows(3).getString(0) == "attr-soup")
  }

  test("q_html_extract plan: scan-side scalar work, single pass") {
    val df = graft.MoreQueries.registry("q_html_extract")._1(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // no joins of any kind — the pipeline rides the scan; the only
    // exchange is the final orderBy's range partitioning
    assert(!plan.contains("Join"), plan.take(800))
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected only the sort exchange:\n$plan")
  }
}
