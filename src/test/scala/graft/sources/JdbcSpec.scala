package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JdbcSpec extends SparkSpec {
  import spark.implicits._

  test("write → partitioned read round-trips rows and splits by range") {
    val url = Jdbc.freshDerby("/tmp/graft_test/derby_spec/db")
    val src = (1L to 100L).map(i => (i, i * 7 % 13, s"name_$i"))
      .toDF("id", "bucket", "name")
    Jdbc.write(src, url, "t_rt")
    val back = Jdbc.readPartitioned(spark, url, "t_rt", "id", 4)
    // 4 range slices of the partition column, as DBInputFormat split its
    // SELECT — each task reads a disjoint WHERE range
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
    val got = back.as[(Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == src.as[(Long, Long, String)].collect().sortBy(_._1).toSeq)
  }

  test("filters push down into the database's WHERE clause") {
    val url = Jdbc.freshDerby("/tmp/graft_test/derby_spec2/db")
    Jdbc.write((1L to 50L).toDF("id"), url, "t_push")
    val filtered = Jdbc.read(spark, url, "t_push").where(col("id") > 40)
    assert(filtered.count() == 10)
    // the JDBC scan node must carry the pushed predicate (not a Spark-side
    // post-filter of a full table read)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"expected pushed JDBC filter in plan:\n$plan")
  }

  test("freshDerby discards previous database state") {
    val dir = "/tmp/graft_test/derby_spec3/db"
    val url1 = Jdbc.freshDerby(dir)
    Jdbc.write(Seq(1L).toDF("id"), url1, "t_a")
    val url2 = Jdbc.freshDerby(dir)
    // old table must be gone in the recreated database
    val err = intercept[Exception](Jdbc.read(spark, url2, "t_a").count())
    assert(err.getMessage.toLowerCase.contains("t_a")
      || err.getMessage.contains("42"), err.getMessage)
  }
}
