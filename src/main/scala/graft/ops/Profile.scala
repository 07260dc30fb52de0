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

  /** EXACT equi-depth histogram (`buckets` near-equal-count buckets with
    * per-bucket lo/hi/count) — the optimizer-statistics histogram the
    * metastore's ANALYZE computes, here EXACT and distributed.
    * `bucket = floor((rank-1)·buckets / n)` over the global value rank,
    * so bucket populations differ by at most one row.
    *
    * NOT `ntile()` over an unpartitioned window (the single-task global
    * sort that is this library's forbidden pattern): the rank comes from
    * [[GlobalRank]] — range-repartitioned sort with per-partition
    * offsets, n stays a 1-row broadcast scalar, and the closing groupBy
    * is a k-row aggregate. Ties are safe: equal values may order
    * arbitrarily within a rank run, but bucket counts are fixed rank
    * ranges and each bucket's lo/hi are values AT deterministic rank
    * positions of the sorted multiset — the output is deterministic and
    * engine-replayable even when a value run straddles a boundary.
    */
  def equiDepthHistogram(df: DataFrame, column: String,
                         buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val ranked = GlobalRank.withGlobalRank(
      df.select(col(column).as("v")).where(col("v").isNotNull),
      Seq(col("v")), "rank")
    val n = ranked.agg(count(lit(1)).as("_n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("bucket",
        floor((col("rank") - 1) * lit(buckets) / col("_n")).cast("long"))
      .groupBy(col("bucket"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        count(lit(1)).as("cnt"))
  }

  /** Population Stability Index between two snapshots of a numeric
    * column over FIXED bin boundaries — the standard drift monitor a
    * data pipeline alarms on between loads (PSI < 0.1 stable, > 0.25
    * population shift). `PSI = Σ (pᵢ − qᵢ)·ln(pᵢ/qᵢ)` over the bins;
    * bins are a broadcast-size when-chain riding each scan (two
    * scan-side aggregates, one |bins|-row join — nothing corpus-sized
    * shuffles).
    *
    * Determinism: zero-count bins take the standard ε = 1e-6 proportion
    * on BOTH sides; per-bin ln(p/q) quantizes at 1e9 before the
    * (p−q)-weighted sum and the sum runs over 1e-6-integer proportions,
    * so the only doubles are bit-identical ratios of BIGINTs and the
    * one final round-6.
    */
  def psiDrift(oldDf: DataFrame, newDf: DataFrame, value: Column,
               boundaries: Seq[Long]): DataFrame = {
    require(boundaries.nonEmpty &&
        boundaries.sliding(2).forall(p => p.size < 2 || p(0) < p(1)),
      "boundaries must be strictly increasing (a duplicate boundary " +
        "would double-count its bin's PSI term and inflate n_bins)")
    val bucket = boundaries.init.foldRight(lit(boundaries.last): Column) {
      case (b, acc) => when(value <= b, lit(b)).otherwise(acc)
    }
    def binned(df: DataFrame, cnt: String) = df
      .select(bucket.as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(cnt))
    val spark = oldDf.sparkSession
    import spark.implicits._
    val bins = broadcast(boundaries.toDF("bin"))
    val o = binned(oldDf, "n_old")
    val n = binned(newDf, "n_new")
    val joined = bins.join(o, Seq("bin"), "left").join(n, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val tot = joined.agg(sum(col("n_old")).as("_to"), sum(col("n_new")).as("_tn"))
    val eps = 1e-6
    val withP = joined.crossJoin(broadcast(tot))
      .withColumn("p", greatest(col("n_old").cast("double") / col("_to"), lit(eps)))
      .withColumn("q", greatest(col("n_new").cast("double") / col("_tn"), lit(eps)))
      .withColumn("term",
        (col("p") - col("q")) * (round(log(col("p") / col("q")) * lit(1e9), 0) / lit(1e9)))
    withP.agg(round(sum(round(col("term") * lit(1e9), 0)) / lit(1e9), 6).as("psi"),
      count(lit(1)).as("n_bins"))
  }
}
