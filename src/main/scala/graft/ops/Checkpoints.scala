package graft.ops

import org.apache.spark.sql.DataFrame

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
  */
object Checkpoints {

  val ReliableKey = "spark.graft.checkpoint.reliable"

  /** Truncate `df`'s lineage: reliable `checkpoint` when the switch is on,
    * `localCheckpoint` otherwise. `eager` as in Dataset.checkpoint.
    */
  def truncate(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf.getOption(ReliableKey).exists(_.toBoolean)
    if (reliable) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true requires sparkContext.setCheckpointDir(...)")
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)
  }
}
