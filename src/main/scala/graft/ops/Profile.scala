package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling — the warehouse `ANALYZE TABLE ... COMPUTE
  * STATISTICS FOR COLUMNS` job (the reference era ran dedicated
  * counter-collecting MR jobs for this; the stats fed the metastore that
  * planned subsequent queries).
  *
  * All requested columns profile in ONE aggregation pass: Catalyst
  * plans the multi-distinct via a single expand (rows × |cols|), all
  * partially aggregated map-side — no per-column jobs, no driver loop.
  * The wide one-row result then unpivots to one row per column with a
  * pure explode. min/max surface as strings so heterogeneous column
  * types share one schema (the metastore convention).
  */
object Profile {

  /** (`column`, `non_nulls`, `nulls`, `distinct`, `min`, `max`) — one
    * row per profiled column, exact counts.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] =
      count(lit(1)).as("__total") +: cols.flatMap(c => Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col(s"__nn_$c").as("non_nulls"),
        (col("__total") - col(s"__nn_$c")).as("nulls"),
        col(s"__nd_$c").as("distinct"),
        col(s"__min_$c").as("min"),
        col(s"__max_$c").as("max"))): _*)).as("p"))
      .select("p.*")
  }
}
