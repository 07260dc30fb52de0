package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scan-time record filters — the reference's `SequenceFileInputFilter`
  * family (`/root/reference/src/mapred/org/apache/hadoop/mapred/SequenceFileInputFilter.java:41,103,146,195`):
  * RegexFilter (key matches regex), PercentFilter (every f-th record),
  * MD5Filter (hash(key) % f == 0).
  *
  * Spark-first: these are plain `filter` Columns — Catalyst pushes
  * compatible predicates into the parquet scan, and the md5 variant is a
  * *deterministic, engine-independent* sample (unlike row-position
  * sampling, which is partition-order-dependent and meaningless under a
  * distributed scan — the reference's PercentFilter contract only ever made
  * sense for a single sequential reader, so we document the md5 filter as
  * its scale-correct replacement).
  */
object Sampling {

  /** Keep records whose key matches the regex. */
  def regexFilter(key: Column, pattern: String): Column =
    key.rlike(pattern)

  /** Deterministic 1-in-f sample on a stable key hash (MD5Filter analog).
    * Uses md5 hex so any engine (Spark, DuckDB, Python) reproduces the
    * same sample — important for cross-system test oracles.
    */
  def md5Filter(key: Column, f: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % f === 0

  /** Hex-prefix variant: keep keys whose md5 starts with `prefix` —
    * a 16^-len(prefix) sample, trivially expressible in any SQL dialect.
    */
  def md5PrefixFilter(key: Column, prefix: String): Column =
    substring(md5(key.cast("string")), 1, prefix.length) === prefix
}
