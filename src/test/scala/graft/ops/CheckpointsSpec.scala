package graft.ops

import graft.SparkSpec
import graft.dedup.Dedup

class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  test("reliable switch without a checkpoint dir fails loudly") {
    // direct guard assertion — order-independent (runs even if another
    // suite already set a checkpoint dir on the shared context, which
    // cannot be unset)
    val e = intercept[IllegalArgumentException](Checkpoints.requireDir(false))
    assert(e.getMessage.contains("setCheckpointDir"))
    // end-to-end variant only while the shared context still has no dir
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      spark.conf.set(Checkpoints.ReliableKey, "true")
      try assertThrows[IllegalArgumentException](
        Checkpoints.truncate(spark.range(1).toDF))
      finally spark.conf.unset(Checkpoints.ReliableKey)
    }
  }

  test("reliable switch uses checkpoint() into the checkpoint dir") {
    val dir = "/tmp/graft_test/reliable_ckpt"
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Checkpoints.ReliableKey, "true")
    try {
      val df = Checkpoints.truncate(spark.range(100).toDF("id"))
      assert(df.as[Long].collect().sorted.toSeq == (0L until 100L))
      // a reliable checkpoint leaves RDD files under the checkpoint dir
      def files(f: java.io.File): Int =
        if (f.isFile) 1
        else Option(f.listFiles()).map(_.map(files).sum).getOrElse(0)
      assert(files(new java.io.File(dir)) > 0, "no checkpoint files written")
      // lineage is truncated to the checkpointed RDD
      assert(df.rdd.toDebugString.contains("ReliableCheckpointRDD"))
    } finally spark.conf.unset(Checkpoints.ReliableKey)
  }

  test("reliable truncateTracked with eager=false still releases its dir") {
    // a lazy reliable checkpoint creates its rdd-* dir only at first
    // materialization — after truncateTracked's diff — so without the
    // forced-eager fix release() would be a silent no-op and the dir
    // would leak (the exact leak class truncateTracked exists to fix)
    val ckptDir = "/tmp/graft_test/reliable_ckpt_lazy"
    spark.sparkContext.setCheckpointDir(ckptDir)
    def rddDirs: Set[String] = {
      val p = new org.apache.hadoop.fs.Path(
        spark.sparkContext.getCheckpointDir.get)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Set.empty[String]
      else fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("rdd-"))
        .map(_.getPath.toString).toSet
    }
    spark.conf.set(Checkpoints.ReliableKey, "true")
    try {
      val before = rddDirs
      val tr = Checkpoints.truncateTracked(spark.range(50).toDF("id"), eager = false)
      assert(tr.df.count() == 50)
      assert((rddDirs -- before).nonEmpty, "no checkpoint dir was captured")
      tr.release()
      assert((rddDirs -- before).isEmpty,
        "lazy reliable checkpoint dir leaked after release()")
    } finally spark.conf.unset(Checkpoints.ReliableKey)
  }

  test("dedupClusters is identical under local and reliable checkpoints") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("doc_a", "doc_b")
    val local = Dedup.dedupClusters(pairs)
      .as[(Long, Long)].collect().sorted.toSeq
    spark.conf.set(Checkpoints.ReliableKey, "true")
    val reliable = try Dedup.dedupClusters(pairs)
      .as[(Long, Long)].collect().sorted.toSeq
    finally spark.conf.unset(Checkpoints.ReliableKey)
    assert(local == reliable)
    assert(reliable.toMap == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("dedupClusters releases superseded checkpoint storage, local + reliable") {
    // diameter-6 chain → ≥6 propagation iterations, so a leak would pin
    // multiple generations on either path
    val pairs = (1L to 6L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")

    // local path: persistent-RDD diff — only the final label generation
    // may remain (it IS the result's data)
    val beforeIds = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.dedupClusters(pairs).collect()
    val leakedIds = spark.sparkContext.getPersistentRDDs.keySet -- beforeIds
    assert(leakedIds.size <= 1, s"local checkpoint generations leaked: $leakedIds")
    leakedIds.foreach(id => spark.sparkContext.getPersistentRDDs
      .get(id).foreach(_.unpersist(false)))

    // reliable path: rdd-* dir diff under the checkpoint dir
    spark.sparkContext.setCheckpointDir("/tmp/graft_test/reliable_ckpt_leak")
    def rddDirs: Set[String] = {
      val p = new org.apache.hadoop.fs.Path(
        spark.sparkContext.getCheckpointDir.get)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Set.empty[String]
      else fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("rdd-"))
        .map(_.getPath.toString).toSet
    }
    val beforeDirs = rddDirs
    spark.conf.set(Checkpoints.ReliableKey, "true")
    try Dedup.dedupClusters(pairs).collect()
    finally spark.conf.unset(Checkpoints.ReliableKey)
    val leakedDirs = rddDirs -- beforeDirs
    assert(leakedDirs.size <= 1, s"reliable checkpoint dirs leaked: $leakedDirs")
  }
}
