package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import scala.collection.immutable.TreeSet

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
  * same property).
  *
  * For unbounded exact distinct use `count_distinct`; for 100 TB-scale
  * estimates use `approx_count_distinct` (HLL). This Aggregator exists for
  * the reference's *capped* semantics, which neither built-in has.
  */
final case class UniqReport(count: Long, items: Seq[String])

class CappedUniq(cap: Int) extends Aggregator[String, TreeSet[String], UniqReport] {
  import org.apache.spark.sql.{Encoder, Encoders}
  override def zero: TreeSet[String] = TreeSet.empty[String]
  override def reduce(b: TreeSet[String], a: String): TreeSet[String] = trim(b + a)
  override def merge(b1: TreeSet[String], b2: TreeSet[String]): TreeSet[String] =
    trim(b1 ++ b2)
  private def trim(s: TreeSet[String]): TreeSet[String] =
    if (s.size <= cap) s else s.take(cap)
  override def finish(r: TreeSet[String]): UniqReport =
    UniqReport(r.size.toLong, r.toSeq)
  override def bufferEncoder: Encoder[TreeSet[String]] =
    Encoders.kryo[TreeSet[String]]
  override def outputEncoder: Encoder[UniqReport] = Encoders.product[UniqReport]
}
