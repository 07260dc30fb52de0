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

  /** Stratified sample: per-stratum keep rates over a stable key hash —
    * the training-data "downsample the overrepresented class" operator
    * (and the scale-correct analog of the reference InputSampler's
    * per-split sampling,
    * `/root/reference/src/mapred/org/apache/hadoop/mapred/lib/InputSampler.java:118`:
    * its samplers draw from `java.util.Random` per split, so the sample
    * depends on the split layout — this hash sample is reproducible on
    * any engine and any partitioning).
    *
    * Keep iff `hash01(key) < rate(stratum)`, where hash01 is the first 8
    * md5 hex digits scaled to [0,1). A stratum absent from `rates` keeps
    * everything (rate 1.0). Rates quantize at 2^-32 — exact for any rate
    * expressible in 32 bits, and replayable in SQL as
    * `CAST(CONV(SUBSTR(md5(k),1,8),16,10) AS DOUBLE) / 4294967296 < r`.
    *
    * Scale: a pure codegen'd filter Column — no shuffle, no per-split
    * state; at 100 TB the sample decision rides the scan.
    */
  def stratifiedSample(key: Column, stratum: Column,
                       rates: Map[String, Double]): Column = {
    val hash01 = conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    rates.toSeq.sortBy(_._1).foldLeft(lit(1.0)) { case (acc, (s, r)) =>
      when(stratum === s, lit(r)).otherwise(acc)
    } > hash01
  }

  /** Deterministic weighted repetition — the corpus-MIXING primitive
    * (per-source epoch weights / temperature sampling in pretraining
    * data recipes): each row emits `floor(w)` copies plus one more iff
    * `hash01(key) < frac(w)`, tagged `copy_id` (0-based) so downstream
    * shuffling can treat copies as distinct examples. One knob serves
    * both directions: w < 1 downsamples (the fractional gate alone),
    * w > 1 upsamples. The gate reuses [[stratifiedSample]]'s md5
    * [0,1) hash — reproducible on any engine and any partitioning, so
    * the exact output replays in SQL. Pure Column 1→N generator
    * (sequence + explode) — no shuffle, no per-split state; at 100 TB
    * the mix decision rides the scan, and expected output size is
    * exactly Σw. Non-positive weights yield no copies (floor(w) + gate
    * ≤ 0 → the row is dropped, same as w = 0).
    */
  def weightedRepeat(df: org.apache.spark.sql.DataFrame, key: Column,
                     weight: Column): org.apache.spark.sql.DataFrame = {
    val hash01 = conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    val copies = floor(weight).cast("long") +
      when(hash01 < weight - floor(weight), lit(1L)).otherwise(lit(0L))
    df.withColumn("_n", copies)
      .where(col("_n") > 0)
      .select(col("*"), explode(sequence(lit(0L), col("_n") - 1)).as("copy_id"))
      .drop("_n")
  }
}
