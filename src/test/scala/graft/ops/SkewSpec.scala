package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted aggregation equals direct groupBy for any salt count") {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val direct = li.groupBy(col("l_returnflag").as("key"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast("long")).as("qty"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (salt <- Seq(1, 4, 33)) {
      val salted = Skew.saltedAggregate(li, col("l_returnflag"), salt, Seq(
        ("cnt", count(lit(1)), sum(col("cnt"))),
        ("qty", sum(col("l_quantity").cast("long")), sum(col("qty")))))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(salted == direct, s"salt=$salt")
    }
  }

  test("split points are monotone and partition data evenly-ish") {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val pts = Skew.splitPoints(li, "l_extendedprice", 8)
    assert(pts.length == 7)
    assert(pts.toSeq == pts.sorted.toSeq)
    // each of the 8 ranges should hold roughly 1/8 of rows (loose bounds)
    val total = li.count()
    val firstBucket = li.where(col("l_extendedprice") <= pts.head).count()
    assert(firstBucket > total / 16 && firstBucket < total / 4)
  }
}
