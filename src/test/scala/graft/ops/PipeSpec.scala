package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipeSpec extends SparkSpec {

  test("pipe through cat is identity on the line protocol") {
    import spark.implicits._
    val df = Seq(("k1", "v1"), ("k2", "v2")).toDF("key", "value")
    val got = Pipe.pipe(df, Seq("cat"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set("k1" -> "v1", "k2" -> "v2"))
  }

  test("pipe through tr uppercases values (real subprocess transform)") {
    import spark.implicits._
    val df = Seq(("k1", "abc")).toDF("key", "value")
    val got = Pipe.pipe(df, Seq("tr", "a-z", "A-Z"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set("K1" -> "ABC"))
  }

  test("splitKeyValue: no separator → whole line is key, empty value") {
    import spark.implicits._
    val df = Seq("justakey", "k\tv").toDF("line")
    val got = df.select(Pipe.splitKeyValue(col("line"), "\t", 1): _*)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set("justakey" -> "", "k" -> "v"))
  }

  test("numKeyFields>1: key is first n fields joined") {
    import spark.implicits._
    val df = Seq("a\tb\tc\td").toDF("line")
    val got = df.select(Pipe.splitKeyValue(col("line"), "\t", 2): _*)
      .collect().map(r => (r.getString(0), r.getString(1))).head
    assert(got == ("a\tb" -> "c\td"))
  }

  test("custom separator round-trips (TestStreamingSeparator analog)") {
    import spark.implicits._
    val df = Seq(("k1", "v1"), ("k2", "v:with:colons")).toDF("key", "value")
    val got = Pipe.pipe(df, Seq("cat"), sep = ":")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // value containing the separator splits at the FIRST one only when
    // numKeyFields=1 — the rest stays in the value
    assert(got == Set("k1" -> "v1", "k2" -> "v:with:colons"))
  }

  test("multi-char separator honored in key/value split") {
    import spark.implicits._
    val df = Seq("a::b::c").toDF("line")
    val got = df.select(Pipe.splitKeyValue(col("line"), "::", 1): _*)
      .head()
    assert((got.getString(0), got.getString(1)) == ("a" -> "b::c"))
  }

  test("differing input/output separators (TestStreamingSeparator case)") {
    import spark.implicits._
    // rows render with ',' into the subprocess; tr rewrites ',' to ':',
    // so the output lines carry a DIFFERENT separator than the input —
    // exactly the reference's stream.map.output.field.separator split
    val df = Seq(("k1", "v1"), ("k2", "v2")).toDF("key", "value")
    val got = Pipe.pipe(df, Seq("tr", ",", ":"), sep = ",", outSep = ":")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set("k1" -> "v1", "k2" -> "v2"))
  }

  test("null fields keep their separator position (explicit empty field)") {
    import spark.implicits._
    val df = Seq(("k1", null: String, "c1"), ("k2", "b2", "c2"))
      .toDF("key", "mid", "last")
    val got = Pipe.pipe(df, Seq("cat"), numKeyFields = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // null mid column renders as an empty field, NOT dropped — the value
    // side keeps two fields with the leading separator intact
    assert(got == Set("k1" -> "\tc1", "k2" -> "b2\tc2"))
  }

  test("aggregateReduce folds type:id entries like -reducer aggregate") {
    import spark.implicits._
    val kv = Seq(("LongValueSum:word1", "2"), ("LongValueSum:word1", "3"),
      ("LongValueSum:word2", "1")).toDF("key", "value")
    val got = Pipe.aggregateReduce(kv)
      .collect().map(r => (r.getString(1), r.getDouble(2))).toMap
    assert(got == Map("word1" -> 5.0, "word2" -> 1.0))
  }
}
