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

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  test("versioned compaction: concurrent reads never fail, data never changes") {
    val root = "/tmp/graft_test/compaction_versioned"
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
      // three generations: exercises the marker-commit publish AND the
      // retirement of versions two generations back while the reader
      // hammers resolve
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

  test("versioned compaction stress: 20 swaps under a hammering reader") {
    // the commit path has no rename and no overwrite of a live file —
    // each version is published by the atomic creation of an immutable
    // `_committed_v=N` marker, so no number of swaps opens a reader
    // window. grace=2 keeps two superseded generations alive, which is
    // the retention a slow scanner on a real store would need.
    val root = "/tmp/graft_test/compaction_stress"
    rmrf(new java.io.File(root))
    val src = graft.Tables.load(spark, sfDir, "nation")
    Compaction.writeVersioned(src.repartition(8), root)
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
      (1 to 20).foreach { _ =>
        Compaction.compactVersioned(spark, root, targetFileBytes = 512L * 1024,
          grace = 2)
      }
    } finally { stop = true; reader.join() }
    assert(failure.isEmpty, s"concurrent read failed: ${failure.map(_.toString)}")
    assert(reads > 0, "reader thread never completed a read")
    assert(spark.read.parquet(Compaction.resolve(spark, root)).count() == expect)
    // head is v=20; grace=2 keeps v=18..20
    val vs = new java.io.File(root).listFiles().map(_.getName)
      .filter(_.startsWith("v=")).sorted
    assert(vs.toSeq == Seq("v=18", "v=19", "v=20"),
      s"expected grace-of-two retention, had ${vs.toSeq}")
  }

  test("writeVersioned is init-only: re-initializing a live root fails loudly") {
    // resolve takes the MAX committed version, so a re-init's v=0 would
    // be invisible to every reader — the write must refuse, not vanish
    val root = "/tmp/graft_test/compaction_reinit"
    rmrf(new java.io.File(root))
    val src = graft.Tables.load(spark, sfDir, "region")
    Compaction.writeVersioned(src, root)
    Compaction.compactVersioned(spark, root, targetFileBytes = 512L * 1024)
    val e = intercept[IllegalArgumentException] {
      Compaction.writeVersioned(src, root)
    }
    assert(e.getMessage.contains("already has committed versions"))
    // the refused write changed nothing
    assert(Compaction.resolve(spark, root).endsWith("v=1"))
  }

  test("resolve survives a transiently missing commit marker") {
    // reader-side self-healing: even with an atomic publish, real stores
    // have eventual-consistency windows — resolve must retry, not throw.
    val root = "/tmp/graft_test/compaction_resolve_retry"
    rmrf(new java.io.File(root))
    val src = graft.Tables.load(spark, sfDir, "region")
    Compaction.writeVersioned(src, root)
    val marker = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("_committed_v=")).head
    val hidden = new java.io.File(root, ".hidden_marker")
    assert(marker.renameTo(hidden), "test setup: could not hide marker")
    // restore the marker after resolve has started retrying
    val restorer = new Thread(() => { Thread.sleep(120); hidden.renameTo(marker) })
    restorer.start()
    val dir = Compaction.resolve(spark, root) // must survive the window
    restorer.join()
    assert(spark.read.parquet(dir).count() == src.count())
  }

  test("stray non-numeric marker names are skipped, not fatal") {
    // a copying tool can leave `_committed_v=0.tmp` next to the real
    // markers; resolve must skip it instead of throwing NumberFormatException
    val root = "/tmp/graft_test/compaction_stray_marker"
    rmrf(new java.io.File(root))
    val src = graft.Tables.load(spark, sfDir, "region")
    Compaction.writeVersioned(src, root)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "_committed_v=0.tmp"), "junk")
    assert(Compaction.resolve(spark, root).endsWith("v=0"))
    assert(spark.read.parquet(Compaction.resolve(spark, root)).count() == src.count())
  }

  test("resolve fails fast on a missing table root") {
    // a typo'd root is not an eventual-consistency window: the error must
    // surface in well under the 20x25ms marker-retry budget
    val root = "/tmp/graft_test/compaction_no_such_root"
    rmrf(new java.io.File(root))
    val t0 = System.nanoTime()
    val e = intercept[java.io.FileNotFoundException] {
      Compaction.resolve(spark, root)
    }
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(e.getMessage.contains("does not exist"))
    assert(elapsedMs < 300, s"missing-root resolve took ${elapsedMs}ms; should fail fast")
  }

  test("commit markers are create-once: double-publishing a version fails loudly") {
    val root = "/tmp/graft_test/compaction_double_publish"
    rmrf(new java.io.File(root))
    val src = graft.Tables.load(spark, sfDir, "region")
    Compaction.writeVersioned(src, root) // publishes _committed_v=0
    intercept[java.io.IOException] {
      Compaction.commitMarker(spark, root, 0)
    }
    // the refused publish changed nothing
    assert(Compaction.resolve(spark, root).endsWith("v=0"))
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
