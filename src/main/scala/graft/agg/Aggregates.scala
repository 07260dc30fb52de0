package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The reference's declarative aggregate framework
  * (`/root/reference/src/mapred/org/apache/hadoop/mapred/lib/aggregate/`),
  * re-expressed as Catalyst aggregations.
  *
  * In the reference, mappers emit `"type:id\tvalue"` entries
  * (`ValueAggregatorBaseDescriptor.java:84`) and a generic
  * mapper/combiner/reducer folds each id with the named `ValueAggregator`
  * (LongValueSum, DoubleValueSum, LongValueMax/Min, StringValueMax/Min,
  * UniqValueCount, ValueHistogram). The Combiner is the partial aggregate.
  *
  * Spark-first: every aggregator maps to a built-in Catalyst aggregate —
  * partial (map-side) + final aggregation is planned automatically, with
  * whole-stage codegen; no custom UDAF is needed except where semantics
  * differ (capped UniqValueCount — see [[CappedUniq]]).
  */
object Aggregates {

  /** Descriptor-name → aggregation Column over a `value` column, mirroring
    * `ValueAggregatorBaseDescriptor.java:34-84` type names.
    */
  def forDescriptor(name: String, value: Column): Column = name match {
    case "LongValueSum"    => sum(value.cast("long")).as("agg")
    case "DoubleValueSum"  => sum(value.cast("double")).as("agg")
    case "LongValueMax"    => max(value.cast("long")).as("agg")
    case "LongValueMin"    => min(value.cast("long")).as("agg")
    case "StringValueMax"  => max(value.cast("string")).as("agg")
    case "StringValueMin"  => min(value.cast("string")).as("agg")
    case "UniqValueCount"  => count_distinct(value).as("agg")
    case other => throw new IllegalArgumentException(s"unknown aggregator: $other")
  }

  /** The whole aggregate-framework job shape: a (id, value) stream folded
    * per id with the named aggregator — `aggregate(df, "LongValueSum")` ≡
    * `ValueAggregatorJob` with one descriptor.
    */
  def aggregate(df: DataFrame, descriptor: String,
                id: String = "id", value: String = "value"): DataFrame =
    df.groupBy(id).agg(forDescriptor(descriptor, col(value)))

  /** `ValueHistogram` (`ValueHistogram.java:33-60`): per id, build the
    * value→count map, then report stats *over the per-value counts*:
    * unique count, min, median, max, mean, stddev.
    *
    * Two-level aggregation — both levels are shuffle-partial-aggregated by
    * Catalyst; the per-(id,value) pre-aggregation also bounds skew (a hot id
    * first collapses by value across the cluster before the stats pass).
    */
  def valueHistogram(df: DataFrame, id: String, value: String): DataFrame = {
    val perValue = df.groupBy(col(id), col(value).as("v"))
      .agg(count(lit(1)).as("vcnt"))
    val c = col("vcnt")
    perValue.groupBy(col(id)).agg(
      count(lit(1)).as("uniq_cnt"),
      min(c).as("min_cnt"),
      median(c).as("median_cnt"),
      max(c).as("max_cnt"),
      avg(c).as("mean_cnt"),
      coalesce(stddev_pop(c), lit(0.0)).as("stddev_cnt"))
  }

  /** The full text-line protocol of `ValueAggregatorJob`
    * (`ValueAggregatorBaseDescriptor.generateEntry` `:84`): each line is
    * `type:id<TAB>value`; fold per (type, id) with the aggregator named by
    * `type`. Numeric aggregators only (string max/min would need a second
    * output column); result emitted as a double `agg` column.
    */
  def aggregateTextLines(df: DataFrame, line: Column): DataFrame = {
    val tab = split(line, "\t", 2)
    val key = get(tab, lit(0))
    val parsed = df.select(
      get(split(key, ":", 2), lit(0)).as("atype"),
      coalesce(get(split(key, ":", 2), lit(1)), lit("")).as("id"),
      coalesce(get(tab, lit(1)), lit("")).as("value"))
    parsed.groupBy("atype", "id").agg(
      sum(col("value").cast("double")).as("_sum"),
      max(col("value").cast("double")).as("_max"),
      min(col("value").cast("double")).as("_min"),
      count_distinct(col("value")).as("_uniq"))
      .select(col("atype"), col("id"),
        when(col("atype").isin("LongValueSum", "DoubleValueSum"), col("_sum"))
          .when(col("atype") === "LongValueMax", col("_max"))
          .when(col("atype") === "LongValueMin", col("_min"))
          .when(col("atype") === "UniqValueCount", col("_uniq").cast("double"))
          .as("agg"))
  }
}

/** Capped exact-distinct — the reference's `UniqValueCount`
  * (`/root/reference/src/mapred/org/apache/hadoop/mapred/lib/aggregate/UniqValueCount.java:30-70`)
  * keeps a TreeMap of uniques bounded by `maxNumItems`. TreeMap retention
  * means the *smallest* `cap` distinct values survive — deterministic
  * regardless of input order, which is what makes this safe to run as a
  * distributed partial aggregate (the reference's combiner relied on the
  * same property: smallest-cap of a union = smallest-cap of the two
  * sides' smallest-caps, so merge-and-trim loses nothing).
  *
  * For unbounded exact distinct use `count_distinct`; for 100 TB-scale
  * estimates use `approx_count_distinct` (HLL). This Aggregator exists for
  * the reference's *capped* semantics, which neither built-in has.
  *
  * The buffer is a pair of `Seq[String]` in a product encoder —
  * Tungsten-native (UnsafeArrayData), so partial merges ship flat bytes
  * instead of serializing an opaque Kryo blob per merge, and the aggregate
  * stays inside the codegen'd hash-aggregate path.
  */
final case class UniqReport(count: Long, items: Seq[String])

/** Two-sided buffer: `sorted` is sorted-distinct (≤ cap, smallest seen);
  * `pending` holds raw appends awaiting compaction (≤ cap). Splitting the
  * buffer keeps reduce() O(1) amortized — a full sorted rebuild per input
  * row is O(cap) per row, O(rows·cap) per group, which on a hot key with a
  * large cap outweighs the Tungsten-encoder win this Aggregator exists for.
  */
final case class UniqBuf(sorted: Seq[String], pending: Seq[String])

class CappedUniq(cap: Int) extends Aggregator[String, UniqBuf, UniqReport] {
  import org.apache.spark.sql.{Encoder, Encoders}
  override def zero: UniqBuf = UniqBuf(Vector.empty, Vector.empty)
  override def reduce(b: UniqBuf, a: String): UniqBuf =
    // Early drop: once `sorted` holds cap values all ≤ its last element,
    // any a ≥ that last element already has cap smaller values ahead of it
    // and can never enter the final smallest-cap set.
    if (b.sorted.length >= cap && b.sorted.last <= a) b
    else {
      val p = b.pending :+ a
      if (p.length >= cap) UniqBuf(compact(b.sorted, p), Vector.empty)
      else UniqBuf(b.sorted, p)
    }
  override def merge(b1: UniqBuf, b2: UniqBuf): UniqBuf =
    UniqBuf(mergeSorted(compact(b1.sorted, b1.pending).toIndexedSeq,
      compact(b2.sorted, b2.pending).toIndexedSeq), Vector.empty)
  /** Fold `pending` into the sorted-distinct side (sort-distinct the small
    * pending batch, then one two-pointer merge) — amortizes to O(log cap)
    * per reduced row.
    */
  private def compact(sorted: Seq[String], pending: Seq[String]): Seq[String] =
    if (pending.isEmpty) sorted
    else mergeSorted(sorted.toIndexedSeq, pending.distinct.sorted.toIndexedSeq)
  /** Two-pointer merge of sorted-distinct inputs; stops at `cap` items —
    * values beyond the cap can never re-enter (TreeMap retention keeps
    * the smallest), so they are dropped, not buffered.
    */
  private def mergeSorted(x: IndexedSeq[String], y: IndexedSeq[String]): Seq[String] = {
    val out = Vector.newBuilder[String]
    var n = 0
    var last: String = null
    var i = 0
    var j = 0
    while (n < cap && (i < x.length || j < y.length)) {
      val pick =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) { val v = x(i); i += 1; v }
        else { val v = y(j); j += 1; v }
      if (last == null || last != pick) { out += pick; n += 1; last = pick }
    }
    out.result()
  }
  override def finish(r: UniqBuf): UniqReport = {
    val items = compact(r.sorted, r.pending)
    UniqReport(items.size.toLong, items)
  }
  override def bufferEncoder: Encoder[UniqBuf] = Encoders.product[UniqBuf]
  override def outputEncoder: Encoder[UniqReport] = Encoders.product[UniqReport]
}
