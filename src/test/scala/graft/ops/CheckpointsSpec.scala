package graft.ops

import graft.SparkSpec
import graft.dedup.Dedup

/** NOTE: test order matters — the guard test must run before any test
  * sets a checkpoint dir on the shared SparkContext (a set dir cannot be
  * unset). No other suite sets one.
  */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  test("reliable switch without a checkpoint dir fails loudly") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    spark.conf.set(Checkpoints.ReliableKey, "true")
    try assertThrows[IllegalArgumentException](
      Checkpoints.truncate(spark.range(1).toDF))
    finally spark.conf.unset(Checkpoints.ReliableKey)
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
}
