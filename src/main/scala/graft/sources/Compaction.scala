package graft.sources

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the warehouse housekeeping job every
  * streaming/incremental sink needs (reference-era analog: the archive
  * "loader" jobs that merged per-hour log files; a micro-batch parquet
  * sink at 100 TB accretes millions of KB-sized files and scan task
  * counts explode).
  *
  * `compact` rewrites a parquet directory into ≈`targetFileBytes` files:
  * the partition count derives from the directory's actual byte size, so
  * the same call is right for 10 MB and 10 TB. The rewrite goes to a
  * sibling tmp dir first and swaps in only after the write commits — a
  * failed compaction leaves the source untouched. On a real deployment
  * compaction runs per table-partition with a metastore location swap;
  * the directory-swap here is the single-directory form of the same
  * pattern.
  */
object Compaction {

  /** @return (filesBefore, filesAfter) parquet part-file counts. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parts(p: org.apache.hadoop.fs.Path): Array[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
    val before = parts(hPath)
    val bytes = before.map(_.getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "_compacting")
    fs.delete(tmp, true)
    // coalesce, not repartition: compaction must not pay a shuffle — it
    // only concatenates row groups (ordering within files may change,
    // which parquet table semantics permit)
    spark.read.parquet(path).coalesce(n)
      .write.mode("overwrite").parquet(tmp.toString)
    val after = parts(tmp).length
    // swap: the window without a live directory is the local-FS cost of
    // atomicity; metastore deployments swap the table location instead
    fs.delete(hPath, true)
    require(fs.rename(tmp, hPath), s"rename $tmp -> $hPath failed")
    (before.length, after)
  }
}
