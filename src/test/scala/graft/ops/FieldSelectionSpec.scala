package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FieldSelectionSpec extends SparkSpec {
  import FieldSelection._

  test("spec parser: explicit, range, open range, key:value split") {
    val s = parse("4,3,0,1:6,5,1-3,7-")
    assert(s.key == FieldList(Seq(4, 3, 0, 1), None))
    assert(s.value == FieldList(Seq(6, 5, 1, 2, 3), Some(7)))
  }

  test("open range on key side is recorded but key list keeps explicit only") {
    val s = parse("0,2-")
    assert(s.key.indices == Seq(0))
    assert(s.key.allFrom.contains(2))
  }

  test("selects and rejoins fields like unix cut") {
    import spark.implicits._
    val df = Seq("a\tb\tc\td\te").toDF("line")
    val (k, v) = keyValue(col("line"), "1:3,0,2-")
    val row = df.select(k.as("key"), v.as("value")).head()
    assert(row.getString(0) == "b")
    assert(row.getString(1) == "d\ta\tc\td\te")
  }

  test("missing fields become empty strings") {
    import spark.implicits._
    val df = Seq("a\tb").toDF("line")
    val (k, v) = keyValue(col("line"), "0,5:1")
    val row = df.select(k.as("key"), v.as("value")).head()
    assert(row.getString(0) == "a\t")
    assert(row.getString(1) == "b")
  }

  test("empty value side yields empty string") {
    import spark.implicits._
    val df = Seq("x\ty").toDF("line")
    val (k, v) = keyValue(col("line"), "0:")
    val row = df.select(k.as("key"), v.as("value")).head()
    assert(row.getString(0) == "x")
    assert(row.getString(1) == "")
  }
}
