package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional data skipping for the
  * warehouse layout problem the reference era solved one dimension at a
  * time (partition directories by date, sort files by one key): a scan
  * filtered on EITHER of two columns can only prune files if the layout
  * localizes BOTH, and interleaving the columns' bits gives every file a
  * small bounding box in both dimensions at once (the Delta/Iceberg
  * Z-ORDER discipline, Morton 1966).
  *
  * At 100 TB the payoff is file/row-group pruning: parquet min/max
  * stats per file turn a 2-D box predicate into a scan of the few files
  * whose boxes intersect it — the ZOrderSpec measures exactly that
  * (bounding boxes under z-layout vs a single-key sort vs an
  * uncorrelated layout). The z-value itself is a pure codegen'd Column
  * (shift/mask/add — no UDF), so clustering is one range-repartition by
  * `_z`, the same total-order machinery as every other sort here.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative integer
    * columns: bit `i` of `x` lands at position `2i`, bit `i` of `y` at
    * `2i+1`. Columns wider than `bits` bits cluster by their low bits
    * only (still a valid layout key, just coarser).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftright(xl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(yl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Re-cluster `df` into `n` z-contiguous partitions over `(xCol,
    * yCol)` — written as-is, each output file covers a small box in both
    * dimensions. Row content is untouched; only layout changes.
    */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
                 bits: Int, n: Int): DataFrame =
    df.withColumn("_z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(n, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
}
