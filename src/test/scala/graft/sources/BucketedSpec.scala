package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {

  test("bucketed-bucketed join runs with zero shuffle exchanges") {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = graft.Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    Bucketed.writeBucketed(li, "li_bkt", "l_orderkey", 8)
    Bucketed.writeBucketed(ord, "ord_bkt", "o_orderkey", 8)

    // force a join strategy that respects bucketing (not broadcast);
    // the hint goes on an input relation, not the joined result
    val smj = Bucketed.table(spark, "li_bkt").hint("merge")
      .join(Bucketed.table(spark, "ord_bkt"),
        col("l_orderkey") === col("o_orderkey"))
    assert(Bucketed.shuffleCount(smj) == 0,
      s"expected co-located join, plan:\n${smj.queryExecution.executedPlan}")

    // and the result is still correct
    val n = smj.count()
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    assert(n == expected)
  }

  test("point lookup on a bucketed table prunes to one bucket (MapFile analog)") {
    // li_bkt written by the co-location test (8 buckets on l_orderkey)
    val key = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey").head().getLong(0)
    // the auto-bucketed-scan heuristic skips bucketed reads for plain
    // filters; force it so the point lookup prunes to one bucket file
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val lookup = Bucketed.table(spark, "li_bkt").where(col("l_orderkey") === key)
      val plan = lookup.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected bucket pruning in:\n$plan")
      assert(lookup.count() > 0)
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    }
  }

  test("unbucketed same join shuffles both sides (the baseline it saves)") {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = graft.Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    val smj = li.hint("merge").join(ord, col("l_orderkey") === col("o_orderkey"))
    assert(Bucketed.shuffleCount(smj) == 2)
  }
}
