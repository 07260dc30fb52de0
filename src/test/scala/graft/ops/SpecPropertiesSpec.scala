package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SortValidator-style invariants, SURVEY.md §5):
  * generated inputs, structural properties rather than golden outputs.
  * Uses raw ScalaCheck generators with fixed seeds (the scalatest bridge
  * artifact isn't in the offline cache).
  */
class SpecPropertiesSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  val fieldGen: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(6))).map(_.take(8))

  test("field selection of single indices returns exactly those fields") {
    import spark.implicits._
    val cases = samples(Gen.zip(fieldGen, Gen.choose(0, 7)), 30)
      .filter(_._1.nonEmpty)
    val rows = cases.map { case (fields, idx) => (fields.mkString("\t"), idx, fields) }
    rows.groupBy(_._2).foreach { case (idx, group) =>
      val df = group.map(_._1).toDF("line")
      val (k, _) = FieldSelection.keyValue(col("line"), s"$idx:0")
      val got = df.select(col("line"), k.as("key")).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      group.foreach { case (line, _, fields) =>
        val expected = if (idx < fields.length) fields(idx) else ""
        assert(got(line) == expected, s"spec $idx on $fields")
      }
    }
  }

  test("numericPrefix agrees with Java parse on numeric-prefixed strings") {
    import spark.implicits._
    val gen = Gen.zip(Gen.choose(-1000000, 1000000), Gen.alphaStr.map(_.take(3)))
    val cases = samples(gen, 60).map { case (n, suf) => (s"$n$suf", n.toDouble) }
    val df = cases.map(_._1).toDF("s")
    val got = df.select(col("s"), KeyFieldSpec.numericPrefix(col("s")).as("n"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    cases.foreach { case (s, expected) => assert(got(s) == expected, s) }
  }

  test("keyfield sort is a permutation preserving multiset (SortValidator)") {
    import spark.implicits._
    val rowGen = Gen.listOfN(80, Gen.zip(Gen.choose(0, 20), Gen.alphaStr.map(_.take(4))))
    samples(rowGen, 5).filter(_.nonEmpty).foreach { rows =>
      val df = rows.map { case (n, s) => s"$s\t$n" }.toDF("line")
      val sorted = df.orderBy(
        KeyFieldSpec.sortColumns(col("line"), "-k2,2nr -k1,1"): _*)
        .as[String].collect().toSeq
      assert(sorted.sorted == df.as[String].collect().toSeq.sorted)
      val nums = sorted.map(_.split("\t")(1).toInt)
      if (nums.size > 1)
        assert(nums.zip(nums.tail).forall { case (a, b) => a >= b })
    }
  }

  test("minhash signatures are invariant to shingle duplication and order of docs") {
    import spark.implicits._
    val docGen = Gen.listOfN(30, Gen.choose(1, 15)).map(_.map(i => s"w$i").mkString(" "))
    val docs = samples(docGen, 10).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df1 = docs.toDF("doc_id", "text")
    val df2 = docs.reverse.toDF("doc_id", "text").repartition(5)
    val s1 = graft.dedup.Dedup.minhashSignatures(df1, 4).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val s2 = graft.dedup.Dedup.minhashSignatures(df2, 4).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(s1 == s2)
  }
}
