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

  test("unbucketed same join shuffles both sides (the baseline it saves)") {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = graft.Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    val smj = li.hint("merge").join(ord, col("l_orderkey") === col("o_orderkey"))
    assert(Bucketed.shuffleCount(smj) == 2)
  }
}
