package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  test("profile counts nulls, distincts, and min/max per column in one pass") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("b")), (Some(2L), None), (None, Some("a")),
      (Some(2L), Some("a")), (None, None)
    ).toDF("x", "y")
    val got = Profile.profile(df, Seq("x", "y")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(got("x") == ((3L, 2L, 2L, "1", "2")))
    assert(got("y") == ((3L, 2L, 2L, "a", "b")))
  }

  test("single aggregation pass: one shuffle regardless of column count") {
    val cust = graft.Tables.load(spark, sfDir, "customer")
    val plan = Profile.profile(cust,
      Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
      .queryExecution.executedPlan.toString
    // multi-distinct plans as expand + two-level agg: exchanges stay
    // bounded (partial/final agg pair + the final single-partition
    // gather of one row), never one job per column
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"profile must read the table once, saw $scans scans:\n$plan")
  }
}
