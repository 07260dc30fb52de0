package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggregatesSpec extends SparkSpec {

  test("descriptor aggregators match hand computation") {
    import spark.implicits._
    val df = Seq(("a", "3"), ("a", "5"), ("b", "2")).toDF("id", "value")
    val sum = Aggregates.aggregate(df, "LongValueSum")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map("a" -> 8L, "b" -> 2L))
    val mx = Aggregates.aggregate(df, "StringValueMax")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(mx == Map("a" -> "5", "b" -> "2"))
  }

  test("valueHistogram reports stats over per-value counts") {
    import spark.implicits._
    // id "x": values a,a,a,b → counts {a:3, b:1}: uniq=2 min=1 max=3
    // median=2 mean=2 stddev_pop=1
    val df = Seq(("x", "a"), ("x", "a"), ("x", "a"), ("x", "b")).toDF("id", "v")
    val r = Aggregates.valueHistogram(df, "id", "v").head()
    assert(r.getLong(1) == 2L)           // uniq_cnt
    assert(r.getLong(2) == 1L)           // min_cnt
    assert(r.getDouble(3) == 2.0)        // median_cnt
    assert(r.getLong(4) == 3L)           // max_cnt
    assert(r.getDouble(5) == 2.0)        // mean_cnt
    assert(math.abs(r.getDouble(6) - 1.0) < 1e-12) // stddev_cnt
  }

  test("CappedUniq keeps the smallest cap distinct values, order-independent") {
    import spark.implicits._
    val agg = udaf(new CappedUniq(3))
    val df = Seq("d", "b", "e", "a", "c", "b", "a").toDF("v")
    val r = df.select(agg(col("v"))).head().getStruct(0)
    assert(r.getLong(0) == 3L)
    assert(r.getSeq[String](1) == Seq("a", "b", "c"))
    // reversed input → same result (merge determinism)
    val r2 = Seq("a", "b", "c", "e", "a", "b", "d").toDF("v")
      .repartition(4).select(agg(col("v"))).head().getStruct(0)
    assert(r2.getSeq[String](1) == Seq("a", "b", "c"))
  }
}
