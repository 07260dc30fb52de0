package graft.join

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {

  private def kv(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toDF("key", "v")
  }

  test("innerComposite: key must appear in all sources; per-key cross product") {
    val a = kv(1 -> "a1", 2 -> "a2")
    val b = kv(1 -> "b1", 1 -> "b1x", 3 -> "b3")
    val j = Joins.innerComposite("key", a, b)
    val got = j.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1, "a1", "b1"), (1, "a1", "b1x")))
  }

  test("outerComposite: every key from any source, nulls for absent") {
    val a = kv(1 -> "a1")
    val b = kv(2 -> "b2")
    val j = Joins.outerComposite("key", a, b)
    val got = j.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1, "a1", null), (2, null, "b2")))
  }

  test("overrideJoin: rightmost source wins per key, NO cross product") {
    val low = kv(1 -> "low1", 1 -> "low1b", 2 -> "low2")
    val high = kv(1 -> "high1", 1 -> "high1b", 3 -> "high3")
    val j = Joins.overrideJoin("key", low, high)
    val got = j.collect().map(r => (r.getInt(0), r.getString(1))).toSet
    // key 1: only high's rows (both of them — no cross product with low's 2 rows)
    // key 2: only in low → low's row; key 3: high's row
    assert(got == Set((1, "high1"), (1, "high1b"), (2, "low2"), (3, "high3")))
    assert(j.count() == 4) // cardinality check: 2+1+1, never 2*2
  }

  test("overrideJoin with three sources: priority is rightmost-first") {
    val s0 = kv(1 -> "zero")
    val s1 = kv(1 -> "one", 2 -> "one2")
    val s2 = kv(2 -> "two")
    val j = Joins.overrideJoin("key", s0, s1, s2)
    val got = j.collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "one"), (2, "two")))
  }
}
