package graft.sql

import graft.SparkSpec
import graft.text.{TextAnalysis, Urls}
import graft.functions.TextExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SQL surface's contract: every registered function produces the
  * SAME expression tree the Scala Column API builds — plans through
  * `spark.sql` are bit-identical (modulo expr ids) to plans through the
  * library, so nothing behind this surface is a black-box UDF.
  */
class SqlSurfaceSpec extends SparkSpec {

  private def normPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString
      .replaceAll("#\\d+L?", "#x").replaceAll("plan_id=\\d+", "plan_id=x")
      .replaceAll("\\bid=#?\\d+\\b", "id=x")
      // the lambda-variable counter is JVM-global; x_1 in one plan is
      // x_3 in the other with identical structure
      .replaceAll("\\bx_\\d+", "x_n")

  private lazy val docs = {
    GraftSql.register(spark)
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.createOrReplaceTempView("sqlsurface_docs")
    d
  }

  test("scalar functions: SQL route ≡ Column route, value for value") {
    val pairs: Seq[(String, String, DataFrame)] = Seq(
      ("graft_token_count", "graft_token_count(text)",
        docs.select(TextAnalysis.tokenCount(col("text")).as("v"))),
      ("graft_lang_id", "graft_lang_id(text)",
        docs.select(TextAnalysis.langId(col("text")).as("v"))),
      ("graft_signals", "concat_ws(':', graft_signals(text).lang_pred, " +
        "graft_signals(text).tok_cnt, graft_signals(text).quality)",
        docs.select(concat_ws(":", TextAnalysis.signals(col("text"))("lang_pred"),
          TextAnalysis.signals(col("text"))("tok_cnt"),
          TextAnalysis.signals(col("text"))("quality")).as("v"))),
      ("graft_mojibake_count", "graft_mojibake_count(text)",
        docs.select(TextAnalysis.mojibakeCount(col("text")).as("v"))),
      ("graft_replacement_count", "graft_replacement_count(text)",
        docs.select(TextAnalysis.replacementCount(col("text")).as("v"))),
      ("graft_control_count", "graft_control_count(text)",
        docs.select(TextAnalysis.controlCount(col("text")).as("v"))),
      ("graft_encoding_keep", "cast(graft_encoding_keep(text) as string)",
        docs.select(TextAnalysis.encodingKeep(col("text")).cast("string").as("v"))),
      ("graft_tokenize", "array_join(graft_tokenize(text), ' ')",
        docs.select(array_join(TextAnalysis.tokenize(col("text")), " ").as("v"))),
      ("graft_shingles", "array_join(graft_shingles(text), '|')",
        docs.select(array_join(graft.dedup.Dedup.shingles(col("text")), "|").as("v"))),
      ("graft_subword_count", "graft_subword_count(text)",
        docs.select(TextAnalysis.subwordCount(col("text")).as("v"))),
      ("graft_quality", "graft_quality(text)",
        docs.select(TextAnalysis.qualityScore(col("text")).as("v"))),
      ("graft_punct_ratio", "graft_punct_ratio(text)",
        docs.select(TextAnalysis.punctRatio(col("text")).as("v"))),
      ("graft_stopword_ratio", "graft_stopword_ratio(text)",
        docs.select(TextAnalysis.stopwordRatio(col("text")).as("v"))),
      ("graft_mean_token_len", "graft_mean_token_len(text)",
        docs.select(TextAnalysis.meanTokenLen(col("text")).as("v"))),
      ("graft_fingerprint", "graft_fingerprint(text)",
        docs.select(TextAnalysis.fingerprint(col("text")).as("v"))),
      ("graft_canonical_key", "graft_canonical_key(text)",
        docs.select(TextExpressions.canonicalTextKey(col("text")).as("v"))),
      ("graft_homoglyph_fold", "graft_homoglyph_fold(text)",
        docs.select(TextAnalysis.homoglyphFold(col("text")).as("v"))),
      ("unicode_nfkc", "unicode_nfkc(text)",
        docs.select(TextExpressions.nfkc(col("text")).as("v"))),
      ("graft_pii_scrub",
        "graft_pii_scrub(concat(text, ' u@example.com 10.1.2.3 5551234567 .'))",
        docs.select(TextAnalysis.scrubPii(concat(col("text"),
          lit(" u@example.com 10.1.2.3 5551234567 ."))).as("v"))),
      ("graft_repetition", "cast(graft_repetition(text) AS string)",
        docs.select(TextAnalysis.repetitionRatioScalar(col("text"))
          .cast("string").as("v"))),
      ("graft_entropy", "cast(graft_entropy(text) AS string)",
        docs.select(TextAnalysis.unigramEntropyScalar(col("text"))
          .cast("string").as("v"))),
      ("graft_simhash64",
        "array_join(transform(graft_simhash64(text), v -> cast(v AS string)), ',')",
        docs.select(array_join(transform(
          graft.dedup.Dedup.simhash64Array(col("text")),
          v => v.cast("string")), ",").as("v"))),
      ("graft_latin_count", "graft_latin_count(text)",
        docs.select(TextAnalysis.latinCount(col("text")).as("v"))),
      ("graft_cyrillic_count", "graft_cyrillic_count(text)",
        docs.select(TextAnalysis.cyrillicCount(col("text")).as("v"))),
      ("graft_cjk_count", "graft_cjk_count(text)",
        docs.select(TextAnalysis.cjkCount(col("text")).as("v"))),
      ("graft_mixed_script_count", "graft_mixed_script_count(text)",
        docs.select(TextAnalysis.mixedScriptCount(col("text")).as("v"))),
      ("graft_script_spoof", "cast(graft_script_spoof(text) AS string)",
        docs.select(TextAnalysis.scriptSpoofFlag(col("text"))
          .cast("string").as("v"))),
      ("graft_minhash_sig",
        "array_join(transform(graft_minhash_sig(text), v -> cast(v AS string)), ',')",
        docs.select(array_join(transform(
          graft.dedup.Dedup.minhashSigArray(col("text")),
          v => v.cast("string")), ",").as("v"))),
      ("graft_minhash_bands",
        "array_join(graft_minhash_bands(text), ',')",
        docs.select(array_join(
          graft.dedup.Dedup.minhashBandKeys(col("text")), ",").as("v"))),
      ("graft_psl_domain",
        "graft_psl_domain(concat('a.b.Site-', source, '.CO.UK'))",
        docs.select(graft.functions.UrlExpressions.pslDomain(
          concat(lit("a.b.Site-"), col("source"), lit(".CO.UK"))).as("v"))),
      ("graft_html_extract",
        "graft_html_extract(concat('<p>', text, '</p><script>x</script>'))",
        docs.select(graft.text.Html.htmlExtract(
          concat(lit("<p>"), col("text"), lit("</p><script>x</script>")))
          .as("v"))),
      ("graft_html_main",
        "graft_html_main(concat('<nav><a href=\"/\">x</a> <a href=\"/\">y</a>" +
          "</nav><p>', text, '</p>'))",
        docs.select(graft.text.Html.htmlMainText(
          concat(lit("<nav><a href=\"/\">x</a> <a href=\"/\">y</a></nav><p>"),
            col("text"), lit("</p>"))).as("v"))),
    )
    pairs.foreach { case (name, sqlExpr, viaColumn) =>
      val viaSql = spark.sql(
        s"SELECT $sqlExpr AS v FROM sqlsurface_docs ORDER BY v")
      val a = viaSql.collect().map(_.get(0)).toSeq
      val b = viaColumn.orderBy("v").collect().map(_.get(0)).toSeq
      assert(a == b, s"$name: SQL route diverged from the Column route")
    }
  }

  test("url functions: SQL route ≡ Column route on messy inputs") {
    val urls = docs.select(concat(lit("HTTPS://user@www.Example-"),
      col("source"), lit(".COM:443/p/"), col("doc_id"),
      lit("?b=2&a=1&utm_source=x#f")).as("u"))
    urls.createOrReplaceTempView("sqlsurface_urls")
    val viaSql = spark.sql("""SELECT graft_url_canonical(u) AS cu,
        graft_url_host(u) AS h,
        graft_registered_domain(graft_url_host(u)) AS rd
      FROM sqlsurface_urls ORDER BY cu""").collect().map(_.toSeq).toSeq
    val viaCol = urls.select(Urls.canonicalizeUrl(col("u")).as("cu"),
        Urls.host(col("u")).as("h"),
        Urls.registeredDomain(Urls.host(col("u"))).as("rd"))
      .orderBy("cu").collect().map(_.toSeq).toSeq
    assert(viaSql == viaCol)
    assert(viaSql.head(0).toString.startsWith("https://www.example-"))
    assert(!viaSql.head(2).toString.contains("www."))
  }

  test("vector functions: SQL route ≡ Column route") {
    import graft.functions.VectorExpressions
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .limit(50).select(col("vec_id"), col("embedding"))
    emb.createOrReplaceTempView("sqlsurface_emb")
    val viaSql = spark.sql("""SELECT vec_id,
        vec_cosine(embedding, embedding) AS c,
        vec_dot(embedding, embedding) AS d
      FROM sqlsurface_emb ORDER BY vec_id""").collect().map(_.toSeq).toSeq
    val viaCol = emb.select(col("vec_id"),
        VectorExpressions.vecCosine(col("embedding"), col("embedding")).as("c"),
        VectorExpressions.vecDot(col("embedding"), col("embedding")).as("d"))
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(viaSql == viaCol)
  }

  test("plans through the SQL surface are the Column-API plans — no UDF") {
    docs.createOrReplaceTempView("sqlsurface_docs") // force registration
    val viaSql = spark.sql("""SELECT lang, sum(graft_token_count(text)) AS t,
        count(DISTINCT graft_fingerprint(text)) AS f
      FROM sqlsurface_docs GROUP BY lang""")
    val viaCol = docs.groupBy("lang").agg(
      sum(TextAnalysis.tokenCount(col("text"))).as("t"),
      countDistinct(TextAnalysis.fingerprint(col("text"))).as("f"))
    assert(normPlan(viaSql) == normPlan(viaCol),
      "SQL-surface plan diverged from the Column-API plan")
    val p = normPlan(viaSql)
    assert(!p.contains("UDF") && !p.contains("BatchEval"),
      "SQL surface must never introduce a black-box UDF")
  }

  test("GraftSqlExtensions injects the same table at session build time") {
    // create() builds a NEW session over the shared context with the
    // injector applied at build time — the same code path the
    // spark.sql.extensions config invokes (instantiate by reflection,
    // apply to the session's SparkSessionExtensions). No register()
    // call anywhere on this session.
    val injector = Class.forName("graft.sql.GraftSqlExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(injector)
      .create()
    // NEVER s2.stop()/close() here: the new session SHARES the suite
    // JVM's SparkContext, and stopping it kills every later suite. The
    // session itself is a lightweight state holder — drop the reference
    // and restore the shared session as active.
    try {
      val r = s2.sql(
        "SELECT graft_token_count('a b  c'), graft_registered_domain('a.b.co.uk')")
        .head()
      assert(r.getInt(0) == 3)
      assert(r.getString(1) == "b.co.uk")
    } finally
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
  }

  test("function table has no duplicate names") {
    val names = GraftSql.functions.map(_._1)
    assert(names.distinct.size == names.size)
  }
}
