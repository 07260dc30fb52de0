package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._

/** Secondary sort — the reference's partition-on-key-part /
  * sort-on-full-key / group-by-grouping-comparator pattern
  * (`/root/reference/src/mapred/org/apache/hadoop/mapred/ReduceTask.java:406,459`,
  * example `src/examples/org/apache/hadoop/examples/SecondarySort.java:133-224`).
  *
  * Scale-critical design (SURVEY.md §7 risk 1): a reference reducer
  * streams ONE pass over an arbitrarily large sorted group. The safe Spark
  * shape is `repartition(groupKeys) + sortWithinPartitions(groupKeys ++
  * orderKeys)` followed by `mapPartitions` that detects group boundaries —
  * groups are never materialized, so a 100 TB group streams exactly like
  * the reference. `groupByKey.flatMapGroups` over the same layout gives
  * Spark's sort-based group iterator (values spill, keys stream) and is
  * what we use for the typed facade; `Window.partitionBy.orderBy` covers
  * the SQL-expressible cases.
  */
object SecondarySort {

  /** Repartition by group keys and sort each partition by group + order
    * keys: after this, every group is contiguous and internally ordered —
    * the exact invariant the reference's shuffle guaranteed to reducers.
    */
  def clusterSort(df: DataFrame, groupKeys: Seq[Column], orderKeys: Seq[Column]): DataFrame =
    df.repartition(groupKeys: _*)
      .sortWithinPartitions((groupKeys.map(_.asc) ++ orderKeys): _*)

  /** Streaming per-group fold over the cluster-sorted layout. `seed`/`step`
    * run per record in sorted order; one output row per group. This is the
    * `Reducer.reduce(key, sortedValues)` migration surface for folds that
    * are order-sensitive (so can't be a commutative Aggregator).
    */
  def foldGroupsSorted[S](df: DataFrame, groupKeys: Seq[Column], orderKeys: Seq[Column])
                         (seed: Row => S)(step: (S, Row) => S)(finish: (Row, S) => Row,
                          outSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    val sorted = clusterSort(df, groupKeys, orderKeys)
    val n = groupKeys.length
    val keyIdx = groupKeys.indices // group key columns are selected first
    val sparkSession = df.sparkSession
    val withKeys = sorted.select((groupKeys ++ Seq(struct(col("*")).as("_row"))): _*)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    withKeys.mapPartitions { it =>
      val buf = it.buffered
      def keyOf(r: Row): Seq[Any] = keyIdx.map(r.get)
      def rowOf(r: Row): Row = r.getStruct(n)
      // One output row per contiguous group; the group's rows stream
      // through `step` and are never buffered.
      new Iterator[Row] {
        def hasNext: Boolean = buf.hasNext
        def next(): Row = {
          val head = buf.next()
          val k = keyOf(head)
          val first = rowOf(head)
          var s = step(seed(first), first)
          while (buf.hasNext && keyOf(buf.head) == k)
            s = step(s, rowOf(buf.next()))
          finish(first, s)
        }
      }
    }
  }
}
