package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Named side-outputs — the reference's `MultipleOutputs`
  * (`/root/reference/src/mapred/org/apache/hadoop/mapred/lib/MultipleOutputs.java:283,303`):
  * one job emits to N named sinks, each with its own format, plus
  * per-output record counters.
  *
  * Spark has no single-pass multi-sink for batch DataFrames; the
  * documented equivalent (SURVEY.md §2.1) is: materialize the routed
  * dataset once (cache or checkpoint), then one filtered write per named
  * output. The input is computed once; each write scans the cached
  * partitions — at cluster scale prefer `partitionBy` (see
  * [[KVText.writePartitionedBy]]) when outputs share a format, and this
  * helper when they genuinely need distinct sinks.
  */
object MultiOutput {

  /** Write each named subset of `df` (routed by `nameCol`) to
    * `baseDir/<name>` in parquet; returns per-output row counts (the
    * reference's per-named-output counters).
    *
    * ONE action per named output: the count rides the write itself via
    * `observe` (zero extra passes) — a separate `count()` per output
    * would re-scan the cached input N more times, which at 100 TB is N
    * full re-reads of a spilled cache.
    */
  def writeNamed(df: DataFrame, nameCol: String, baseDir: String,
                 names: Seq[String]): Map[String, Long] = {
    val routed = df.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      names.map { n =>
        val obs = Observation()
        routed.where(col(nameCol) === n)
          .observe(obs, count(lit(1)).as("cnt"))
          .write.mode(SaveMode.Overwrite).parquet(s"$baseDir/$n")
        n -> obs.get("cnt").asInstanceOf[Long]
      }.toMap
    } finally { routed.unpersist() }
  }
}
