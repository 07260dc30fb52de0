package graft.text

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property invariants of the r14 scalar twins over GENERATED documents:
  * the scalar fold forms (`repetitionRatioScalar`, `unigramEntropyScalar`,
  * `simhash64Array`) must equal their distributed aggregate paths row for
  * row on arbitrary token sequences — including the shapes the 60-doc
  * corpus sample cannot stress (heavy repetition, tiny vocabularies,
  * single runs, whitespace runs). Raw ScalaCheck with fixed seeds
  * (SpecPropertiesSpec convention).
  */
class ScalarTwinPropSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1400L + i)))

  // small vocabulary on purpose: repetition and run-length structure is
  // what the sorted-run fold has to get right
  private val word: Gen[String] = Gen.oneOf(
    "a", "b", "ab", "ba", "the", "of", "xyz", "qq", "a1", "z")

  private val doc: Gen[String] = for {
    n <- Gen.choose(1, 60)
    ws <- Gen.listOfN(n, word)
    // occasional runs of one word — the degenerate run-length shape
    runWord <- word
    runLen <- Gen.choose(0, 20)
    sep <- Gen.oneOf(" ", "  ") // whitespace runs must tokenize away
  } yield (ws ++ Seq.fill(runLen)(runWord)).mkString(sep)

  test("scalar twins ≡ aggregate paths on generated docs") {
    import spark.implicits._
    val texts = samples(doc, 120).distinct
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

    val aggE = TextAnalysis.unigramEntropy(docs)
      .select("doc_id", "entropy").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val aggR = TextAnalysis.repetitionRatio(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val aggS = Dedup.simhash64(docs).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getInt).toList).toMap

    val scalar = docs.select(col("doc_id"),
        TextAnalysis.unigramEntropyScalar(col("text")).as("e"),
        TextAnalysis.repetitionRatioScalar(col("text")).as("r"),
        Dedup.simhash64Array(col("text")).as("s"))
      .collect()
    scalar.foreach { row =>
      val id = row.getLong(0)
      assert(row.getDouble(1) == aggE(id), s"entropy drift on doc $id")
      assert(row.getDouble(2) == aggR(id), s"repetition drift on doc $id")
      assert(row.getSeq[Int](3).toList == aggS(id), s"simhash drift on doc $id")
    }
    // every generated doc has ≥1 token, so each aggregate path emitted
    // a row — the scalar side must have had no NULLs to hide behind
    assert(scalar.length == texts.length)
  }

  test("minhash scalar twins ≡ aggregate paths on generated docs") {
    import spark.implicits._
    val texts = samples(doc, 80).distinct
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val aggSig = Dedup.minhashSignatures(docs, numPerms = 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toList).toMap
    val aggBands = Dedup.lshBands(
        Dedup.minhashSignatures(docs, numPerms = 8), 8, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val viaScalar = docs.select(col("doc_id"),
        Dedup.minhashSigArray(col("text"), 8).as("sig"),
        Dedup.minhashBandKeys(col("text"), 8, 2).as("bk"))
      .collect()
    viaScalar.foreach { row =>
      val id = row.getLong(0)
      assert(row.getSeq[Long](1).toList == aggSig(id), s"sig drift on doc $id")
    }
    val scalarBands = viaScalar.flatMap { row =>
      row.getSeq[String](2).zipWithIndex.map { case (k, b) =>
        (row.getLong(0), b, k)
      }
    }.toSet
    assert(scalarBands == aggBands)
  }
}
