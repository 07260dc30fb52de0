package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {

  test("funnel enforces strict stage ordering and never resurrects") {
    import spark.implicits._
    // u1: clean A(10) B(20) C(30) → reached 3
    // u2: B(5) before A(10), B never after → stalls at stage 1
    // u3: A(10) B(20), C(15) BEFORE B → C must not count → reached 2
    // u4: no A at all → absent from output
    val ev = Seq(
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      (2L, "B", 5L), (2L, "A", 10L),
      (3L, "A", 10L), (3L, "C", 15L), (3L, "B", 20L),
      (4L, "B", 7L), (4L, "C", 9L)
    ).toDF("user_id", "event_type", "us")
    val out = EventAnalytics
      .funnel(ev, "user_id", "event_type", "us", Seq("A", "B", "C"))
      .orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, Some(10L), Some(20L), Some(30L), 3L),
      (2L, Some(10L), None, None, 1L),
      (3L, Some(10L), Some(20L), None, 2L)))
  }

  test("funnel takes the EARLIEST qualifying event per stage") {
    import spark.implicits._
    val ev = Seq(
      (1L, "A", 10L), (1L, "A", 5L), // earliest A wins
      (1L, "B", 7L),                 // before first A(5)? no: 7 > 5 counts
      (1L, "B", 50L)
    ).toDF("user_id", "event_type", "us")
    val r = EventAnalytics
      .funnel(ev, "user_id", "event_type", "us", Seq("A", "B"))
      .head()
    assert(r.getLong(1) == 5L && r.getLong(2) == 7L)
  }

  test("funnel maxGap: stage counts only within the deadline, inclusive") {
    import spark.implicits._
    val ev = Seq(
      (1L, "A", 10L), (1L, "B", 15L), // within gap 10 → converts
      (2L, "A", 10L), (2L, "B", 25L), // beyond 10+10 → stalls
      (3L, "A", 10L), (3L, "B", 20L)  // exactly at the deadline → counts
    ).toDF("user_id", "event_type", "us")
    val out = EventAnalytics
      .funnel(ev, "user_id", "event_type", "us", Seq("A", "B"),
        maxGap = Some(10L))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), Option(r.get(2)), r.getLong(3)))
    assert(out.toSeq == Seq((1L, Some(15L), 2L), (2L, None, 1L),
      (3L, Some(20L), 2L)))
  }

  test("weeklyRetention cohorts by first week, counts distinct per offset") {
    import spark.implicits._
    // days: u1 first day 0 (week 0), active days 0, 8 (offset 1), 8 again
    // u2 first day 7 (week 1), active day 7 only
    val ev = Seq((1L, 0L), (1L, 8L), (1L, 8L), (2L, 7L))
      .toDF("user_id", "day")
    val out = EventAnalytics
      .weeklyRetention(ev, "user_id", col("day"))
      .orderBy("cohort_week", "week_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 0L, 1L), (0L, 1L, 1L), (1L, 0L, 1L)))
  }

  test("saltedTopKPerKey matches the direct window for any saltBuckets") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "n_chars")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    val direct = docs.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 7)
      .orderBy("source", "rnk")
      .collect().map(_.toSeq).toSeq
    for (buckets <- Seq(1, 3, 16)) {
      val salted = Skew.saltedTopKPerKey(docs, col("source"), col("doc_id"),
          k = 7, order = Seq(col("n_chars").desc, col("doc_id")),
          saltBuckets = buckets)
        .select("doc_id", "source", "n_chars", "rnk")
        .orderBy("source", "rnk")
        .collect().map(_.toSeq).toSeq
      assert(salted == direct, s"saltBuckets=$buckets diverged")
    }
  }
}
