package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KeyFieldSpecSpec extends SparkSpec {
  import KeyFieldSpec._

  test("parses -k2,2nr") {
    val specs = parse("-k2,2nr")
    assert(specs == Seq(Spec(2, Some(2), numeric = true, reverse = true)))
  }

  test("parses multi-spec with flags split across positions") {
    val specs = parse("-k2,2nr -k1,1")
    assert(specs == Seq(
      Spec(2, Some(2), numeric = true, reverse = true),
      Spec(1, Some(1), numeric = false, reverse = false)))
  }

  test("open-ended spec -k2 runs to end of line") {
    val specs = parse("-k2n")
    assert(specs == Seq(Spec(2, None, numeric = true, reverse = false)))
  }

  test("numeric-prefix parse follows sort -n rules") {
    import spark.implicits._
    val df = Seq("  42abc", "-3.5x", "+7", "abc", "", ".5z", "-").toDF("s")
    val got = df.select(numericPrefix(col("s"))).as[Double].collect().toSeq
    assert(got == Seq(42.0, -3.5, 7.0, 0.0, 0.0, 0.5, 0.0))
  }

  test("sorts lines by numeric field descending with string tiebreak") {
    import spark.implicits._
    val df = Seq("b\t2", "a\t10", "c\t2", "d\tx").toDF("line")
    val cols = sortColumns(col("line"), "-k2,2nr -k1,1")
    val got = df.orderBy(cols: _*).as[String].collect().toSeq
    assert(got == Seq("a\t10", "b\t2", "c\t2", "d\tx"))
  }

  test("char offsets: -k2.2,3.2 takes field 2 char 2 through field 3 char 2") {
    import spark.implicits._
    val df = Seq("abcd\tefgh\tijkl").toDF("line")
    val key = keyColumns(col("line"), "-k2.2,3.2").head
    assert(df.select(key).head().getString(0) == "fgh\tij")
    // start-only offset runs to end of segment
    val key2 = keyColumns(col("line"), "-k2.3").head
    assert(df.select(key2).head().getString(0) == "gh\tijkl")
    // ordering behaves per the offset key (ignore char 1 of field 2)
    val lines = Seq("aa\tzb\tyy", "aa\tzc\tyy", "aa\tza\tyy").toDF("line")
    val sorted = lines.orderBy(sortColumns(col("line"), "-k2.2,2.2"): _*)
      .as[String].collect().toSeq
    assert(sorted == Seq("aa\tza\tyy", "aa\tzb\tyy", "aa\tzc\tyy"))
  }

  test("char offsets parse into Spec") {
    val s = parse("-k2.3,2.5n").head
    assert(s == Spec(2, Some(2), numeric = true, reverse = false,
      startChar = 3, endChar = 5))
  }

  test("sort output is a permutation of input (SortValidator invariant)") {
    import spark.implicits._
    val lines = graft.Tables.load(spark, sfDir, "documents")
      .select(concat_ws("\t", col("doc_id"), col("lang"), col("n_chars")).as("line"))
    val sorted = lines.orderBy(sortColumns(col("line"), "-k3,3nr"): _*)
    assert(sorted.count() == lines.count())
    assert(sorted.as[String].collect().sorted.toSeq ==
      lines.as[String].collect().sorted.toSeq)
  }
}
