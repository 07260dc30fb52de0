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
}
