package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  private def one(text: String, c: org.apache.spark.sql.Column) = {
    import spark.implicits._
    Seq(text).toDF("text").select(c).head()
  }

  test("langId picks language with most stopword hits, und on no evidence") {
    assert(one("the cat and the dog", TextAnalysis.langId(col("text"))).getString(0) == "en")
    assert(one("le chat et la vie est dans", TextAnalysis.langId(col("text"))).getString(0) == "fr")
    assert(one("der hund ist nicht das", TextAnalysis.langId(col("text"))).getString(0) == "de")
    assert(one("xyzzy qwerty", TextAnalysis.langId(col("text"))).getString(0) == "und")
  }

  test("langId tie-break is alphabetical") {
    // "la" is in both es and fr lists (1 hit each) → 'es' (alphabetical)
    assert(one("la cosa", TextAnalysis.langId(col("text"))).getString(0) == "es")
  }

  test("token and subword counts") {
    assert(one("one two  three", TextAnalysis.tokenCount(col("text"))).getInt(0) == 3)
    // 'customer' → cust+omer = 2 subwords; '42' → 2 digits; '!' → 1
    assert(one("customer 42 !", TextAnalysis.subwordCount(col("text"))).getInt(0) == 5)
  }

  test("punctuation ratio and quality bounds") {
    val p = one("a,b.c!", TextAnalysis.punctRatio(col("text"))).getDouble(0)
    assert(math.abs(p - 0.5) < 1e-9)
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val q = docs.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).head()
    assert(q.getDouble(0) >= 0.0 && q.getDouble(1) <= 1.0)
  }

  test("fingerprint equals dedup fingerprint (shared definition)") {
    val docs = graft.Tables.load(spark, sfDir, "documents").limit(50)
    val n = docs.select(
      (TextAnalysis.fingerprint(col("text")) ===
        graft.dedup.Dedup.fingerprint(col("text"))).as("eq"))
      .where(!col("eq")).count()
    assert(n == 0)
  }
}
