package graft.join

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofRangeJoinSpec extends SparkSpec {

  test("asofJoin picks most recent right row at or before left time") {
    import spark.implicits._
    val quotes = Seq(("A", 1L, 10.0), ("A", 5L, 11.0), ("B", 3L, 20.0))
      .toDF("sym", "qt", "px")
    val trades = Seq(("A", 4L, 100), ("A", 5L, 200), ("A", 0L, 300), ("B", 9L, 400))
      .toDF("sym", "tt", "qty")
    val j = Joins.asofJoin(trades, quotes, "sym", "tt", "qt")
    val got = j.select(col("tt"), col("qty"), col("asof.px")).collect()
      .map(r => (r.getLong(0), r.getInt(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(got == Set(
      (4L, 100, Some(10.0)),   // last quote at t<=4 is qt=1
      (5L, 200, Some(11.0)),   // same-instant quote counts (<=)
      (0L, 300, None),         // no quote yet
      (9L, 400, Some(20.0))))
  }

  test("rangeJoin matches the naive non-equi join") {
    import spark.implicits._
    val points = (0L to 100L by 7).toDF("p")
    val intervals = Seq((0L, 10L, "a"), (5L, 30L, "b"), (90L, 200L, "c"), (40L, 41L, "d"))
      .toDF("s", "e", "name")
    val fast = Joins.rangeJoin(points, "p", intervals, "s", "e", bucketWidth = 25)
      .select("p", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val naive = points.crossJoin(intervals)
      .where(col("p") >= col("s") && col("p") <= col("e"))
      .select("p", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fast == naive && fast.nonEmpty)
  }

  test("asofJoin on events equals the q_asof_join query result") {
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts_ns DIV 1000000000").as("sec"), col("event_type"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "sec")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("sec").as("click_sec"))
    val viaLib = Joins.asofJoin(purchases, clicks, "user_id", "sec", "click_sec")
      .select(col("event_id"), col("asof.click_sec"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val viaQuery = graft.Queries.queries("q_asof_join")(spark, sfDir)
      .select(col("event_id"), col("last_click_sec"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(viaLib == viaQuery)
  }
}
