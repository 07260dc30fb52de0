package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage truncation with a cluster-fault-tolerance switch.
  *
  * `localCheckpoint` stores blocks on executors with NO fault tolerance:
  * correct and fast on local[32], but on a real cluster one lost executor
  * kills every job whose lineage was truncated into its blocks — fatal
  * for long iterative work (dedup label propagation over 100 TB). The
  * reference never had this trade-off because every MapReduce stage spilled
  * to durable HDFS (`/root/reference/src/mapred/org/apache/hadoop/mapred/MapOutputFile.java`);
  * the Spark equivalent of that durability is a reliable `checkpoint()`
  * into `spark.sparkContext.setCheckpointDir` (HDFS/S3 on a cluster).
  *
  * Switch: set `spark.graft.checkpoint.reliable=true` (session conf) and a
  * checkpoint dir; every graft iterative/multi-consumer materialization
  * point then uses reliable checkpoints. Default stays local — right for
  * single-node and for clusters where re-running a failed job beats paying
  * per-iteration distributed-FS writes.
  *
  * Iterative jobs MUST release superseded generations ([[truncateTracked]]):
  * on the local path each checkpoint pins a full copy of the table in
  * executor storage (50 leaked generations = eviction storm / OOM at
  * 100 TB); on the reliable path each leaves a ReliableCheckpointRDD
  * directory on the distributed FS that Spark never deletes by itself.
  */
object Checkpoints {

  val ReliableKey = "spark.graft.checkpoint.reliable"

  /** Truncate `df`'s lineage: reliable `checkpoint` when the switch is on,
    * `localCheckpoint` otherwise. `eager` as in Dataset.checkpoint.
    */
  def truncate(df: DataFrame, eager: Boolean = true): DataFrame =
    truncateTracked(df, eager).df

  /** A truncated frame plus `release()`, which frees the truncation's
    * storage: executor blocks for local checkpoints, the
    * `rdd-*` checkpoint directory for reliable ones. Call release only
    * once every consumer of `df` has materialized (the blocks/files ARE
    * `df`'s data after truncation).
    */
  final case class Truncated(df: DataFrame, release: () => Unit)

  /** [[truncate]] that also captures how to free the checkpoint's storage.
    *
    * Tracking is by before/after diff (persistent-RDD ids locally,
    * `rdd-*` dirs under the checkpoint dir reliably) — exact and
    * public-API-only, but assumes no concurrent checkpointing on the same
    * session (graft's iterative loops are sequential).
    */
  def truncateTracked(df: DataFrame, eager: Boolean = true): Truncated = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val reliable = spark.conf.getOption(ReliableKey).exists(_.toBoolean)
    if (reliable) {
      requireDir(sc.getCheckpointDir.isDefined)
      val before = reliableRddDirs(spark)
      // Always materialize eagerly on the reliable path, even when the
      // caller asked for eager=false: a lazy checkpoint creates its rdd-*
      // directory only at first use — AFTER the diff below — so release()
      // would silently leak the directory. Deferring the diff to release()
      // time instead is worse: by then a LATER generation's live dir may
      // have appeared and would be deleted out from under its consumers.
      // The laziness saving is real only on the local path (kept below).
      val cp = df.checkpoint(eager = true)
      val added = reliableRddDirs(spark).diff(before)
      Truncated(cp, () => added.foreach(deleteDir(spark, _)))
    } else {
      val before = sc.getPersistentRDDs.keySet
      val cp = df.localCheckpoint(eager)
      val added = (sc.getPersistentRDDs.keySet -- before).toSeq
      Truncated(cp, () => added.foreach { id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
      })
    }
  }

  /** Guard for the reliable path. Package-visible so the negative case
    * stays testable even after some suite set a checkpoint dir on the
    * shared SparkContext (a set dir cannot be unset).
    */
  private[ops] def requireDir(hasDir: Boolean): Unit =
    require(hasDir, s"$ReliableKey=true requires sparkContext.setCheckpointDir(...)")

  /** `rdd-*` checkpoint directories currently on the checkpoint FS. */
  private def reliableRddDirs(spark: SparkSession): Set[String] = {
    val dir = new Path(spark.sparkContext.getCheckpointDir.get)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("rdd-"))
      .map(_.getPath.toString).toSet
  }

  private def deleteDir(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }
}
