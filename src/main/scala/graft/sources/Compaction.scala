package graft.sources

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the warehouse housekeeping job every
  * streaming/incremental sink needs (reference-era analog: the archive
  * "loader" jobs that merged per-hour log files; a micro-batch parquet
  * sink at 100 TB accretes millions of KB-sized files and scan task
  * counts explode).
  *
  * `compact` rewrites a parquet directory into ≈`targetFileBytes` files:
  * the partition count derives from the directory's actual byte size, so
  * the same call is right for 10 MB and 10 TB. Two swap disciplines:
  *
  *  - [[compact]] swaps in place. Failure-safe at every step (the source
  *    is renamed aside, never deleted, until the compacted dir is live),
  *    but a concurrent reader between the two renames sees a missing
  *    directory — the in-place form trades a reader window for keeping
  *    the path stable.
  *  - [[compactVersioned]] + [[resolve]] close that window without a
  *    metastore: data lives in immutable `v=N` dirs under a table root,
  *    a one-line `CURRENT` pointer file names the live one, and the swap
  *    is an atomic pointer rename (`FileContext.rename(OVERWRITE)` — the
  *    same primitive HDFS gives a metastore). Readers resolve the pointer
  *    per read; the superseded version outlives the swap by one
  *    generation so an in-flight reader holding the old resolution still
  *    completes. This is the single-table form of a metastore location
  *    swap.
  */
object Compaction {

  /** @return (filesBefore, filesAfter) parquet part-file counts. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parts(p: Path): Array[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
    val before = parts(hPath)
    val bytes = before.map(_.getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new Path(path + "_compacting")
    val old = new Path(path + "_old")
    fs.delete(tmp, true)
    fs.delete(old, true)
    // coalesce, not repartition: compaction must not pay a shuffle — it
    // only concatenates row groups (ordering within files may change,
    // which parquet table semantics permit)
    spark.read.parquet(path).coalesce(n)
      .write.mode("overwrite").parquet(tmp.toString)
    val after = parts(tmp).length
    // swap via rename-aside: the source is never deleted before the
    // compacted dir is live, so a crash at any point leaves the data
    // intact (at `path`, or at `path_old` + `path_compacting` — recovery
    // is a rename back). The window without a live `path` between the two
    // renames is the in-place form's cost; compactVersioned closes it.
    require(fs.rename(hPath, old), s"rename $hPath -> $old failed")
    require(fs.rename(tmp, hPath), s"rename $tmp -> $hPath failed")
    fs.delete(old, true)
    (before.length, after)
  }

  private val Current = "CURRENT"

  /** Read the `CURRENT` pointer: the live data directory under `root`. */
  def resolve(spark: SparkSession, root: String): String = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(root, Current))
    val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
    s"$root/$v"
  }

  private def currentVersion(spark: SparkSession, root: String): Long = {
    val dir = resolve(spark, root)
    dir.substring(dir.lastIndexOf("v=") + 2).toLong
  }

  /** Initialize a versioned table root: write the frame as `v=0` and
    * point `CURRENT` at it.
    */
  def writeVersioned(df: org.apache.spark.sql.DataFrame, root: String): Unit = {
    df.write.mode("overwrite").parquet(s"$root/v=0")
    swapPointer(df.sparkSession, root, 0)
  }

  /** Compact the live version into `v=N+1` and atomically repoint
    * `CURRENT`. Versions older than the one just superseded are removed;
    * the superseded version itself survives until the NEXT compaction so
    * readers holding a just-stale resolution finish their scan.
    *
    * @return (filesBefore, filesAfter) part-file counts.
    */
  def compactVersioned(spark: SparkSession, root: String,
                       targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parts(p: Path): Array[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
    val cur = currentVersion(spark, root)
    val src = new Path(s"$root/v=$cur")
    val before = parts(src)
    val bytes = before.map(_.getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val next = new Path(s"$root/v=${cur + 1}")
    fs.delete(next, true)
    spark.read.parquet(src.toString).coalesce(n)
      .write.mode("overwrite").parquet(next.toString)
    val after = parts(next).length
    swapPointer(spark, root, cur + 1)
    // retire everything BEFORE the superseded version (grace of one)
    fs.listStatus(new Path(root))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath)
      .filter(_.getName.stripPrefix("v=").toLong < cur)
      .foreach(fs.delete(_, true))
    (before.length, after)
  }

  /** Atomic pointer swap: write `CURRENT.tmp`, rename over `CURRENT` with
    * `Options.Rename.OVERWRITE` — atomic on HDFS and on POSIX local FS,
    * so a reader sees either the old pointer or the new one, never a
    * missing or partial file.
    */
  private def swapPointer(spark: SparkSession, root: String, v: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(root).getFileSystem(conf)
    val tmp = new Path(root, Current + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(s"v=$v".getBytes("UTF-8")) finally out.close()
    FileContext.getFileContext(tmp.toUri, conf)
      .rename(tmp, new Path(root, Current), Options.Rename.OVERWRITE)
  }
}
