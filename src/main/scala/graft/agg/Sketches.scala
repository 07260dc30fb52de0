package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-count sketch — the mergeable,
  * deterministic cousin of HyperLogLog (Bar-Yossef et al. 2002; the
  * "bottom-k" estimator of Beyer et al., SIGMOD 2007).
  *
  * The reference's `UniqValueCount`
  * (`/root/reference/src/mapred/org/apache/hadoop/mapred/lib/aggregate/UniqValueCount.java:30-70`)
  * caps an exact distinct set; `approx_count_distinct` (HLL) estimates an
  * unbounded one but is not reproducible across engines. KMV sits between:
  * O(k) state, a mergeable sketch (union = union-then-trim, exactly the
  * TreeMap-retention property the reference's combiner relied on), and —
  * because the "randomness" is an md5 hash of the value — a DETERMINISTIC
  * estimate any engine replays bit-for-bit. That last property is why this
  * exists alongside HLL: a cross-system pipeline (Spark writer, non-Spark
  * auditor) can assert on the estimate.
  *
  * Estimator: hash every value to [0,1), keep the k smallest DISTINCT
  * hashes; if fewer than k distinct values exist the sketch IS the exact
  * distinct set, else `(k-1) / h_k` where `h_k` is the k-th smallest hash.
  * Standard error ~ 1/sqrt(k-2).
  *
  * Scale shape (100 TB): one map-side-partial distinct on the 8-byte hash
  * (not the value — a wide string key ships 8 bytes, not its bytes), then
  * a per-partition top-k merge (`TakeOrderedAndProject`) — k rows reach
  * the driver regardless of input size. No global sort.
  */
object Sketches {

  /** Value → [0,1) hash: first 15 md5 hex digits over 16^15. 60 bits of
    * the hash — collision probability over any realistic distinct count
    * is negligible, and 15 hex digits stay exactly representable in both
    * a BIGINT and a DOUBLE (16^15 = 2^60 < 2^63; the quotient's 53-bit
    * rounding is identical IEEE-754 in every engine, so cross-engine
    * replays agree bit-for-bit).
    */
  def hash01(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("double") / lit(1152921504606846976.0) // 16^15

  /** The sketch itself: the k smallest distinct hashes, one `h` column.
    * Union-mergeable: `kmvSketch(a union b) == trim(kmvSketch(a) union
    * kmvSketch(b))` — the k smallest of a union are among the two sides'
    * k smallest (see SketchesSpec).
    */
  def kmvSketch(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.select(hash01(key).as("h")).distinct().orderBy(col("h")).limit(k)
  }

  /** One-row estimate: `(est_distinct, k)`. `est_distinct` rounds at 6
    * decimals for cross-engine hash-compare stability (the arithmetic is
    * identical either way; rounding just fixes the printed form).
    */
  def kmvDistinct(df: DataFrame, key: Column, k: Int): DataFrame =
    kmvSketch(df, key, k)
      .agg(count(lit(1)).as("_n"), max(col("h")).as("_hk"))
      .select(
        round(when(col("_n") < k, col("_n").cast("double"))
          .otherwise(lit((k - 1).toDouble) / col("_hk")), 6).as("est_distinct"),
        lit(k.toLong).as("k"))

  /** Per-group KMV estimates — the "sketch column in a rollup" pattern
    * (one bounded distinct-count per group, mergeable across loads).
    * Output: `(grp, est_distinct, k)`.
    *
    * Scale shape: one map-side-partial distinct on (group, hash), then a
    * per-group bottom-k via a rank window — the window sorts each
    * group's hashes with a SPILLABLE external sort and streams the rank
    * filter (O(1) state per row, nothing materializes per group), so a
    * group with billions of distinct keys costs its sort, never its
    * memory. The closing per-group aggregate reuses the window's group
    * partitioning (hash(grp) satisfies the clustering) — two exchanges
    * total, k rows per group survive.
    */
  def kmvDistinctByGroup(df: DataFrame, group: Column, key: Column,
                         k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val h = df.select(group.as("grp"), hash01(key).as("h")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("h"))
    h.withColumn("_rn", row_number().over(w)).where(col("_rn") <= k)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("_n"), max(col("h")).as("_hk"))
      .select(col("grp"),
        round(when(col("_n") < k, col("_n").cast("double"))
          .otherwise(lit((k - 1).toDouble) / col("_hk")), 6).as("est_distinct"),
        lit(k.toLong).as("k"))
  }
}
