package graft.sources

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Parquet bloom-filter pruning — the BloomMapFile analog
  * (`/root/reference/src/core/org/apache/hadoop/io/BloomMapFile.java:45`:
  * a bloom filter answers negative key lookups without touching the data
  * file). SURVEY §2 maps BloomMapFile onto Parquet's per-column bloom
  * filters; this spec proves the mapping is real: a negative point lookup
  * against a bloom-filtered parquet file reads ZERO records.
  *
  * The setup makes the bloom filter the ONLY thing that can prune:
  *  - the probe key is lexically inside every row group's [min, max], so
  *    column statistics cannot skip;
  *  - dictionary encoding is disabled on write, so parquet's dictionary
  *    filter cannot skip;
  *  - record counts come from executor task input metrics, so a skipped
  *    row group shows as literally nothing read.
  */
class BloomFilterSpec extends SparkSpec {

  /** Total parquet records read by jobs run inside `body` (listener bus is
    * async — polls until the counter is stable).
    */
  private def recordsRead(body: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          acc.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      var stable = 0
      var prev = -1L
      var waitedMs = 0
      while (stable < 3 && waitedMs < 10000) {
        Thread.sleep(100); waitedMs += 100
        val v = acc.get()
        if (v == prev) stable += 1 else { stable = 0; prev = v }
      }
      acc.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("negative key lookup reads zero records from a bloom-filtered file") {
    val dir = "/tmp/graft_test/bloom_parquet"
    val n = 100000
    val df = spark.range(n)
      .select(md5(col("id").cast("string")).as("key"), col("id").as("v"))
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#key", "true")
      .option("parquet.bloom.filter.expected.ndv#key", n.toString)
      .option("parquet.enable.dictionary", "false")
      .option("parquet.block.size", (256 * 1024).toString) // many row groups
      .parquet(dir)

    // mid-range probe: inside [min, max] of the hex key space but (being
    // 31 chars, not 32) never an actual md5 value
    val probe = "8" * 31
    val neg = recordsRead {
      assert(spark.read.parquet(dir).where(col("key") === probe).count() == 0)
    }
    assert(neg == 0, s"bloom filter did not prune row groups: $neg records read")

    // positive control: the same lookup shape on a present key reads > 0
    // records (i.e. the zero above is pruning, not a broken metric)
    val someKey = spark.read.parquet(dir).select("key").head().getString(0)
    val pos = recordsRead {
      assert(spark.read.parquet(dir).where(col("key") === someKey).count() == 1)
    }
    assert(pos > 0)
  }
}
