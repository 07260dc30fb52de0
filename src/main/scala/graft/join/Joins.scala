package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's join library, re-expressed on Catalyst.
  *
  * The reference has two join machines:
  *  - map-side composite join over identically-partitioned, sorted inputs
  *    (`/root/reference/src/mapred/org/apache/hadoop/mapred/join/CompositeInputFormat.java:48`,
  *    DSL `inner(tbl(...), tbl(...))` / `outer(...)` / `override(...)`);
  *  - reduce-side tagged join (`src/contrib/data_join/`): tag, shuffle on
  *    key, cross-product per key in the reducer.
  *
  * Spark-first: both collapse to `Dataset.join`. Catalyst picks
  * sort-merge vs broadcast-hash; the composite join's "presorted inputs"
  * precondition is the bucketed-sorted-table fast path (no shuffle/sort at
  * query time). n-ary joins chain pairwise and the optimizer reorders.
  * `broadcast()` is exposed for the reference's DistributedCache-style
  * map-side hash join.
  */
object Joins {

  /** n-ary inner composite join on a common key column
    * (`InnerJoinRecordReader.java:41-49`): a key appears in the output iff
    * every source has it; duplicate keys produce the per-key cross product
    * in both systems.
    */
  def innerComposite(key: String, sources: DataFrame*): DataFrame =
    sources.reduce((a, b) => a.join(b, Seq(key), "inner"))

  /** n-ary full-outer composite join (`OuterJoinRecordReader.java:40-45`):
    * every key from any source; missing positions are null (the reference's
    * absent TupleWritable slots).
    */
  def outerComposite(key: String, sources: DataFrame*): DataFrame =
    sources.reduce((a, b) => a.join(b, Seq(key), "full_outer"))

  /** `override` join (`OverrideRecordReader.java:30-60`): per key, emit
    * rows only from the *rightmost* (highest-priority) source that has the
    * key — a priority-merge, explicitly NOT a cross product.
    *
    * Implementation: tag each source with its priority, union, keep rows
    * whose priority equals the per-key max. One shuffle (the window on
    * key); no join blow-up when low-priority sources have duplicate keys —
    * matching the reference's cardinality exactly (see SURVEY.md §7 risk 5).
    * All sources must share a schema (the reference joins same-valuetype
    * sources).
    */
  def overrideJoin(key: String, sources: DataFrame*): DataFrame = {
    val tagged = sources.zipWithIndex.map { case (df, i) =>
      df.withColumn("_prio", lit(i))
    }
    val all = tagged.reduce(_ unionByName _)
    val w = Window.partitionBy(col(key))
    all.withColumn("_maxprio", max(col("_prio")).over(w))
      .where(col("_prio") === col("_maxprio"))
      .drop("_prio", "_maxprio")
  }

  /** As-of join: for every left row, the most recent right row with the
    * same key whose `rightTime` <= `leftTime`. Right columns come back
    * nested under `asof` (null struct when no prior right row exists).
    *
    * Scale design: NOT a non-equi join (quadratic per key); both sides
    * union into one stream, one shuffle on the key, one ordered window
    * pass carrying the latest right row forward. 100 TB of events with a
    * hot key costs one sort of that key's rows, not a blow-up.
    * Same-instant rows: the right side sorts before the left (<=
    * semantics, matching e.g. DuckDB's ASOF JOIN).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String): DataFrame = {
    val lCols = left.columns
    val l = left.select(col(key), col(leftTime).cast("long").as("_t"),
      lit(1).as("_kind"), struct(lCols.map(col): _*).as("_l"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        right.drop(key).schema.fields)).as("_r"))
    val r = right.select(col(key), col(rightTime).cast("long").as("_t"),
      lit(0).as("_kind"), lit(null).cast(org.apache.spark.sql.types.StructType(
        left.schema.fields)).as("_l"),
      struct(right.drop(key).columns.map(col): _*).as("_r"))
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_kind") === 1)
      .select(lCols.map(c => col(s"_l.$c").as(c)) :+ col("asof"): _*)
  }

  /** Range (interval) join: rows of `points` matched to rows of
    * `intervals` with `start <= point <= end`. Implemented by bucketizing
    * both sides to width-`bucketWidth` bins and equi-joining on the bin —
    * a broadcast/shuffle hash join plus a residual filter, instead of the
    * nested-loop join Spark would otherwise plan for the non-equi
    * condition. Choose `bucketWidth` >= the typical interval length so
    * each interval explodes into O(1) bins.
    */
  def rangeJoin(points: DataFrame, pointCol: String,
                intervals: DataFrame, startCol: String, endCol: String,
                bucketWidth: Long): DataFrame = {
    val p = points.withColumn("_bin", floor(col(pointCol).cast("long") / bucketWidth))
    val iv = intervals.withColumn("_bin", explode(sequence(
      floor(col(startCol).cast("long") / bucketWidth),
      floor(col(endCol).cast("long") / bucketWidth))))
    p.join(iv, Seq("_bin"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bin")
  }
}
