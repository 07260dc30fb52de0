package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalRankSpec extends SparkSpec {

  test("distributed global rank equals single-partition row_number") {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val cols = Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    val dist = GlobalRank.withGlobalRank(li, cols)
      .select("l_orderkey", "l_linenumber", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val window = li
      .withColumn("rank", row_number().over(Window.orderBy(cols: _*)).cast("long"))
      .select("l_orderkey", "l_linenumber", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(dist == window)
  }

  test("ranks are contiguous 1..n and partitioning-invariant") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "n_chars")
    val cols = Seq(col("n_chars").desc, col("doc_id").asc)
    val r1 = GlobalRank.withGlobalRank(docs, cols)
    val r2 = GlobalRank.withGlobalRank(docs.repartition(17), cols)
    val ranks1 = r1.select("rank").collect().map(_.getLong(0)).sorted
    assert(ranks1.toSeq == (1L to docs.count()).toSeq)
    val m1 = r1.select("doc_id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m2 = r2.select("doc_id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m1 == m2)
  }
}
