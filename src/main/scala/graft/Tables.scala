package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * Mirrors the reference's dataset abstraction — input path(s) + format →
  * record stream (`/root/reference/src/mapred/org/apache/hadoop/mapred/InputFormat.java:67`)
  * — as `spark.read.parquet` scans. Parquet is our native storage (the
  * reference is row-oriented SequenceFile/text; we keep semantics, not
  * layout — see SURVEY.md §1.4).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    // long (spark.sql.legacy.parquet.nanosAsLong — set by our sessions).
    // Expose both: exact `ts_ns` (long nanos) and `ts` (timestamp, µs).
    if (name == "events")
      df.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts_ns DIV 1000")))
    else df
  }

  /** Load every table and register temp views so both the DataFrame API and
    * `spark.sql` can address them by the same names DuckDB uses.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}

/** Session factory with scale-appropriate defaults.
  *
  * Defaults are tuned for local[32]/128 GiB but chosen to be the settings
  * you'd also want on a 1000-executor cluster: AQE on (runtime coalescing +
  * skew-join splitting), modest broadcast threshold, shuffle partitions
  * sized to cores (the driver harness overrides via SPARK_GRAFT_CPUS).
  */
object GraftSession {
  def builder(appName: String, cpus: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", "/tmp/graft-warehouse"))
}
