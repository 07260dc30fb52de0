package graft.ops

import graft.SparkSpec
import graft.sources.Compaction
import org.apache.spark.sql.functions._

/** CDC apply (MERGE/upsert) + SCD2 history — the delta-load semantics. */
class CdcSpec extends SparkSpec {

  private def base() = {
    import spark.implicits._
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "name", "bal")
  }

  test("applyChanges: upsert replaces, delete removes, insert adds, rest pass through") {
    import spark.implicits._
    val changes = Seq(
      (2L, "b2", 21L, 100L, "upsert"),  // update key 2
      (3L, "xx", 0L, 101L, "delete"),   // delete key 3
      (9L, "new", 90L, 102L, "upsert")  // insert key 9
    ).toDF("k", "name", "bal", "seq", "op")
    val merged = Cdc.applyChanges(base(), changes, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(merged == Set((1L, "a", 10L), (2L, "b2", 21L), (9L, "new", 90L)))
  }

  test("applyChanges: highest sequence wins regardless of input order") {
    import spark.implicits._
    val changes = Seq(
      (2L, "late", 99L, 200L, "upsert"),
      (2L, "early", 11L, 100L, "upsert"),
      (1L, "gone", 0L, 150L, "delete"),
      (1L, "back", 12L, 151L, "upsert") // delete then re-insert: upsert wins
    ).toDF("k", "name", "bal", "seq", "op")
    val merged = Cdc.applyChanges(base(), changes, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(merged == Set((1L, "back", 12L), (2L, "late", 99L), (3L, "c", 30L)))
  }

  test("applyChanges: shuffled anti-join fallback matches the broadcast path") {
    import spark.implicits._
    val changes = Seq(
      (2L, "b2", 21L, 100L, "upsert"),
      (3L, "xx", 0L, 101L, "delete")
    ).toDF("k", "name", "bal", "seq", "op")
    val b = Cdc.applyChanges(base(), changes, Seq("k"), broadcastChanges = true)
      .collect().map(_.toSeq).toSet
    val s = Cdc.applyChanges(base(), changes, Seq("k"), broadcastChanges = false)
      .collect().map(_.toSeq).toSet
    assert(b == s)
  }

  test("mergeVersioned: resolve flips to the merged table, old versions retire") {
    import spark.implicits._
    val root = "/tmp/graft_test/cdc_versioned"
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete()
    }
    rmrf(new java.io.File(root))
    Compaction.writeVersioned(base(), root)
    val c1 = Seq((2L, "b2", 21L, 100L, "upsert"))
      .toDF("k", "name", "bal", "seq", "op")
    val v1 = Cdc.mergeVersioned(root, c1, Seq("k"))
    assert(v1 == 1L)
    val after1 = spark.read.parquet(Compaction.resolve(spark, root))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(after1 == Set((1L, "a", 10L), (2L, "b2", 21L), (3L, "c", 30L)))
    val c2 = Seq((1L, "xx", 0L, 200L, "delete"))
      .toDF("k", "name", "bal", "seq", "op")
    assert(Cdc.mergeVersioned(root, c2, Seq("k")) == 2L)
    val after2 = spark.read.parquet(Compaction.resolve(spark, root))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(after2 == Set((2L, "b2", 21L), (3L, "c", 30L)))
    // grace=1 keeps v=1, retires v=0
    val dirs = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(!dirs.contains("v=0") && dirs.contains("v=1") && dirs.contains("v=2"))
  }

  test("applyChanges plan: base rides a broadcast anti-join, only changes shuffle") {
    val base = graft.Tables.load(spark, sfDir, "customer")
    val changes = base.limit(10)
      .withColumn("seq", col("c_custkey"))
      .withColumn("op", lit("upsert"))
    val plan = Cdc.applyChanges(base, changes, Seq("c_custkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"untouched side must be a broadcast anti-join:\n$plan")
    // the only hash exchange is the window over the change log — the
    // 100 TB base is never shuffled
    val hashExchanges = "hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges <= 1,
      s"expected at most one hash exchange (changes window), got $hashExchanges:\n$plan")
  }

  test("scd2History plan: both windows share one exchange and one sort") {
    val log = graft.Tables.load(spark, sfDir, "orders")
    val plan = Cdc.scd2History(log, Seq("o_custkey"),
      Seq("o_orderdate", "o_orderkey"), Seq("o_orderstatus"))
      .queryExecution.executedPlan.toString
    val hashExchanges = "hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1,
      s"episode + close windows must share one exchange, got $hashExchanges:\n$plan")
  }

  test("scd2History: episodes collapse no-change updates, half-open ranges, is_current") {
    import spark.implicits._
    // key 1: A(t1) A(t2) B(t3) B(t4) A(t5) -> episodes A[1,3) B[3,5) A[5,_)
    // key 2: single change -> one open episode
    val log = Seq(
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "B"),
      (1L, 4L, "B"), (1L, 5L, "A"),
      (2L, 7L, "Z")
    ).toDF("k", "ts", "status")
    val hist = Cdc.scd2History(log, Seq("k"), Seq("ts"), Seq("status"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .toSet
    assert(hist == Set(
      (1L, "A", 1L, Some(3L), false),
      (1L, "B", 3L, Some(5L), false),
      (1L, "A", 5L, None, true),
      (2L, "Z", 7L, None, true)))
  }

  test("scd2History: episode boundaries are partitioning-independent") {
    import spark.implicits._
    val log = (1 to 200).map { i =>
      (i % 7L, i.toLong, if ((i / 3) % 2 == 0) "on" else "off")
    }.toDF("k", "ts", "status")
    val a = Cdc.scd2History(log.repartition(1), Seq("k"), Seq("ts"), Seq("status"))
      .collect().map(_.toSeq).toSet
    val b = Cdc.scd2History(log.repartition(13), Seq("k"), Seq("ts"), Seq("status"))
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    import spark.implicits._
    val old = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"), (4L, "d", "w"))
      .toDF("k", "v1", "v2")
    val neu = Seq((2L, "b", "y"), (3L, "c2", "z"), (4L, "d", "w2"), (5L, "e", "q"))
      .toDF("k", "v1", "v2")
    val got = Cdc.snapshotDiff(old, neu, Seq("k"), Seq("v1", "v2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "changed",
      5L -> "added")) // key 2 unchanged → absent
  }

  test("snapshotDiff sees NULL↔value transitions and NULL↔NULL as unchanged") {
    import spark.implicits._
    val old = Seq((1L, Option("a")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("k", "v")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Option("c"))).toDF("k", "v")
    val got = Cdc.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 3L -> "changed"))
  }

  test("snapshotDiff is partitioning-independent") {
    import spark.implicits._
    val old = (1 to 500).map(i => (i.toLong, s"v${i / 3}")).toDF("k", "v")
    val neu = (101 to 600).map(i => (i.toLong, s"v${i / 4}")).toDF("k", "v")
    val a = Cdc.snapshotDiff(old.repartition(1), neu.repartition(1),
      Seq("k"), Seq("v")).collect().map(_.toSeq).toSet
    val b = Cdc.snapshotDiff(old.repartition(13), neu.repartition(7),
      Seq("k"), Seq("v")).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }
}
