package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Observable semantics for the two §2 rows previously covered only "for
  * free" by Spark:
  *
  *  - CombineFileInputFormat (reference: pack many small files into few
  *    splits so task count tracks bytes, not file count) — Spark's file
  *    scan bin-packs by `spark.sql.files.maxPartitionBytes` +
  *    `openCostInBytes`. The spec pins the OBSERVABLE contract: scan
  *    parallelism follows the byte budget, not the file count, and
  *    packing never loses or duplicates rows.
  *  - HashPartitioner (reference: all records of a key meet in one
  *    reduce partition) — `repartition(n, col)` gives the same
  *    co-location contract. The hash FUNCTION deviates from Hadoop's
  *    `key.hashCode % n` (documented SURVEY §7 risk 2: only the grouping
  *    contract matters, no job persists partition indices); the spec
  *    pins what must hold: every key on exactly one partition, all n
  *    partitions used, no row lost.
  */
class SplitPackingSpec extends SparkSpec {

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
    f.delete()
  }

  test("small-file scan parallelism follows the byte budget, not file count") {
    val out = "/tmp/graft_test/split_packing"
    rmrf(new java.io.File(out))
    val src = graft.Tables.load(spark, sfDir, "orders")
    src.repartition(64).write.mode("overwrite").parquet(out)
    val expect = src.count()
    def scanParts(maxPartitionBytes: String): (Int, Long) = {
      val before = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      try {
        val df = spark.read.parquet(out)
        (df.rdd.getNumPartitions, df.count())
      } finally before match {
        case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
        case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
      }
    }
    val (packed, packedRows) = scanParts("1g")       // everything fits one budget
    val (spread, spreadRows) = scanParts("64k")      // budget smaller than a file
    assert(packedRows == expect && spreadRows == expect,
      "bin-packing changed the row count")
    assert(packed < 64,
      s"64 small files should pack into fewer than 64 splits, got $packed")
    assert(spread > packed,
      s"shrinking the byte budget must raise parallelism: $packed -> $spread")
  }

  test("repartition(n, key) co-locates every key on exactly one partition") {
    val n = 7
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"))
    val parts = ev.repartition(n, col("user_id"))
      .select(col("user_id"), col("event_id"),
        spark_partition_id().as("pid"))
    val perKey = parts.groupBy("user_id")
      .agg(countDistinct(col("pid")).as("nparts"), count(lit(1)).as("rows"))
    assert(perKey.where(col("nparts") =!= 1).count() == 0,
      "a key spread across more than one partition breaks the reduce contract")
    // all rows survive and the key space actually uses multiple partitions
    assert(parts.count() == ev.count())
    val used = parts.select("pid").distinct().count()
    assert(used > 1 && used <= n, s"expected multiple of $n partitions used, got $used")
    // co-location is what grouped aggregation relies on: counts per key
    // match a plain groupBy on the unpartitioned frame
    val a = perKey.select(col("user_id"), col("rows"))
    val b = ev.groupBy("user_id").agg(count(lit(1)).as("rows"))
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }
}
