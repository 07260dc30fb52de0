package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partitioned-table overwrite semantics — the warehouse `INSERT
  * OVERWRITE TABLE ... PARTITION(...)` behavior the reference era relied
  * on for daily re-loads (reference analog: per-directory output commit,
  * `src/mapred/org/apache/hadoop/mapred/FileOutputCommitter.java`). With
  * `partitionOverwriteMode=dynamic`, an overwrite touches ONLY the
  * partitions present in the incoming data — at 100 TB a daily re-load
  * rewrites one date directory, not the table.
  */
class WarehouseWriteSpec extends SparkSpec {

  test("dynamic partition overwrite rewrites only the touched partition") {
    val out = "/tmp/graft_test/dyn_overwrite"
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
      def snapshot(): Map[String, Set[(Long, Long)]] =
        spark.read.parquet(out).collect()
          .groupBy(_.getString(2))
          .map { case (t, rs) =>
            t -> rs.map(r => (r.getLong(0), r.getLong(1))).toSet
          }
      val before = snapshot()
      assert(before.size > 2, "need several partitions for the test to mean anything")
      // re-load ONE partition with modified rows (user ids negated)
      ev.where(col("event_type") === "click")
        .withColumn("user_id", -col("user_id"))
        .write.mode("overwrite").partitionBy("event_type").parquet(out)
      val after = snapshot()
      assert(after.keySet == before.keySet, "untouched partitions must survive")
      assert(after("click") == before("click").map { case (e, u) => (e, -u) },
        "touched partition must hold exactly the re-loaded rows")
      (before.keySet - "click").foreach { t =>
        assert(after(t) == before(t), s"partition $t changed without being written")
      }
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("compaction merges small files to the byte target without losing a row") {
    val out = "/tmp/graft_test/compaction"
    val src = graft.Tables.load(spark, sfDir, "orders")
    src.repartition(64).write.mode("overwrite").parquet(out) // tiny-file mess
    val expect = src.collect().map(_.toSeq).toSet
    val (before, after) = Compaction.compact(spark, out,
      targetFileBytes = 512L * 1024)
    assert(before == 64, s"fixture should start at 64 files, had $before")
    assert(after < before, s"compaction did not reduce files: $before -> $after")
    val back = spark.read.parquet(out)
    assert(back.schema == src.schema)
    assert(back.collect().map(_.toSeq).toSet == expect)
    // idempotent-ish: compacting a compacted dir is a no-op-sized rewrite
    val (b2, a2) = Compaction.compact(spark, out, targetFileBytes = 512L * 1024)
    assert(b2 == after && a2 <= b2)
  }

  test("versioned compaction: concurrent reads never fail, data never changes") {
    val root = "/tmp/graft_test/compaction_versioned"
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    rmrf(new java.io.File(root))
    val src = graft.Tables.load(spark, sfDir, "orders")
    Compaction.writeVersioned(src.repartition(64), root)
    val expect = src.count()
    @volatile var failure: Option[Throwable] = None
    @volatile var stop = false
    @volatile var reads = 0
    val reader = new Thread(() => {
      while (!stop && failure.isEmpty) {
        try {
          val n = spark.read.parquet(Compaction.resolve(spark, root)).count()
          assert(n == expect, s"read saw $n rows, expected $expect")
          reads += 1
        } catch { case t: Throwable => failure = Some(t) }
      }
    })
    reader.start()
    try {
      // three generations: exercises the pointer swap AND the retirement
      // of versions two generations back while the reader hammers resolve
      val (b1, a1) = Compaction.compactVersioned(spark, root, targetFileBytes = 512L * 1024)
      assert(b1 == 64 && a1 < b1)
      Compaction.compactVersioned(spark, root, targetFileBytes = 512L * 1024)
      Compaction.compactVersioned(spark, root, targetFileBytes = 512L * 1024)
    } finally { stop = true; reader.join() }
    assert(failure.isEmpty, s"concurrent read failed: ${failure.map(_.toString)}")
    assert(reads > 0, "reader thread never completed a read")
    val back = spark.read.parquet(Compaction.resolve(spark, root))
    assert(back.collect().map(_.toSeq).toSet == src.collect().map(_.toSeq).toSet)
    // only the live + one grace version remain
    val vs = new java.io.File(root).listFiles().map(_.getName).filter(_.startsWith("v=")).sorted
    assert(vs.toSeq == Seq("v=2", "v=3"), s"expected grace-of-one retention, had ${vs.toSeq}")
  }

  test("in-place compact survives with data intact even though path moves aside") {
    // the rename-aside discipline: after compact, no _old or _compacting
    // residue remains and the data is byte-identical
    val out = "/tmp/graft_test/compaction_aside"
    val src = graft.Tables.load(spark, sfDir, "nation")
    src.repartition(8).write.mode("overwrite").parquet(out)
    Compaction.compact(spark, out, targetFileBytes = 512L * 1024)
    assert(!new java.io.File(out + "_old").exists(), "_old residue left behind")
    assert(!new java.io.File(out + "_compacting").exists(), "_compacting residue left behind")
    assert(spark.read.parquet(out).collect().map(_.toSeq).toSet ==
      src.collect().map(_.toSeq).toSet)
  }

  test("static overwrite (default) replaces the whole table - the contrast case") {
    val out = "/tmp/graft_test/static_overwrite"
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    ev.where(col("event_type") === "click")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val types = spark.read.parquet(out).select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("click"), "static overwrite must drop all other partitions")
  }
}
