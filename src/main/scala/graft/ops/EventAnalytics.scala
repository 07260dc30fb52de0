package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence clickstream analytics: funnels and cohort retention.
  *
  * The reference's users ran exactly this class of workload as hand-rolled
  * secondary-sort MapReduce jobs — partition by user, sort by timestamp,
  * walk the event stream in the reducer (the pattern its
  * `Logalyzer`/grep/sort examples and the hive-streaming contrib exist to
  * serve). Re-expressed Spark-first, the per-user "walk" becomes a chain
  * of min-aggregations and user-keyed equi-joins: every shuffle in the
  * chain keys on the SAME user column, so the exchange introduced by the
  * first `groupBy` is reused by every subsequent join (Catalyst sees the
  * matching `HashPartitioning` and plans zero extra shuffles), and no
  * per-user event list is ever materialized — state per key is one row of
  * stage timestamps, not the user's whole history. That is the property
  * that survives 100 TB: a power user with 10^8 events costs the same
  * post-aggregation row as a one-event user.
  */
object EventAnalytics {

  /** Strict-ordering funnel: for each user, the earliest time of stage 1,
    * then the earliest stage-2 event strictly AFTER that, and so on —
    * the standard conversion-funnel semantics where stages must happen in
    * order (a purchase before the first view does not count).
    *
    * Input must carry `userCol`, `typeCol`, and a numeric/orderable
    * `tsCol`. Output: one row per user that entered stage 1, columns
    * `t1..tN` (null once the user drops out — nulls never resurrect:
    * stage i+1 inner-joins on stage i's survivors) and `reached`, the
    * number of stages completed.
    */
  def funnel(ev: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[String], maxGap: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var acc = ev.where(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    for ((st, i) <- stages.tail.zipWithIndex) {
      val prev = s"t${i + 1}"
      val cur = s"t${i + 2}"
      // deadline (conversion-window) variant: stage i+1 must land within
      // maxGap of the finalized stage-i time, not merely after it
      val inWindow = maxGap match {
        case Some(g) => col(tsCol) > col(prev) && col(tsCol) <= col(prev) + g
        case None => col(tsCol) > col(prev)
      }
      val nxt = ev.where(col(typeCol) === st)
        .join(acc.select(col(userCol), col(prev)), Seq(userCol))
        .where(inWindow)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(cur))
      acc = acc.join(nxt, Seq(userCol), "left")
    }
    val reached = stages.indices
      .map(i => when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    acc.withColumn("reached", reached)
  }

  /** Weekly cohort retention: users are cohorted by the week of their
    * first event; each later active week counts them at its offset. Two
    * user-keyed shuffles (first-seen agg + join back) and one small
    * (cohort, offset) agg — the join reuses the agg's partitioning, and
    * the output is cohorts × offsets, metadata-sized at any input scale.
    *
    * `dayCol` is an integer day number (e.g. epoch-µs DIV 86400000000);
    * weeks are `day DIV 7` so the cohort key is engine-independent
    * integer math, no calendar anchoring.
    */
  def weeklyRetention(ev: DataFrame, userCol: String,
                      dayCol: Column): DataFrame = {
    val days = ev.select(col(userCol), dayCol.as("_day"))
    val first = days.groupBy(col(userCol)).agg(min("_day").as("_d0"))
    days.join(first, Seq(userCol))
      .groupBy(expr("_d0 DIV 7").as("cohort_week"),
        expr("(_day - _d0) DIV 7").as("week_offset"))
      .agg(countDistinct(col(userCol)).as("active_users"))
  }
}
