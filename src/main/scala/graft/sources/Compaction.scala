package graft.sources

import java.io.FileNotFoundException

import org.apache.hadoop.fs.Path
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
  *    and each version is published by creating an immutable, empty-ish
  *    commit marker `_committed_v=N` at the root. Readers resolve to the
  *    HIGHEST committed version. Nothing is ever renamed or overwritten
  *    on the commit path — the only visibility primitive is the atomic
  *    appearance of a new directory entry, which holds on local
  *    filesystems, HDFS, and object stores (S3 PUT + strongly consistent
  *    LIST). This is deliberately NOT a mutable `CURRENT` pointer:
  *    Hadoop's local `rename(OVERWRITE)` is delete-then-rename, and
  *    object stores have no atomic rename at all, so any
  *    overwrite-a-pointer scheme has a reader window somewhere. A
  *    superseded version outlives its successor by `grace` generations so
  *    an in-flight reader holding a just-stale resolution still completes
  *    its scan. This is the single-table form of a metastore location
  *    swap (reference promote protocol:
  *    `/root/reference/src/mapred/org/apache/hadoop/mapred/FileOutputCommitter.java:34`).
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

  private val MarkerPrefix = "_committed_v="

  private def committedVersions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(root))
      .filter(s => s.isFile && s.getPath.getName.startsWith(MarkerPrefix))
      // tolerate stray non-numeric suffixes (e.g. `_committed_v=3.tmp`
      // left by a copying tool) rather than poisoning every resolve
      .flatMap(s => scala.util.Try(s.getPath.getName.stripPrefix(MarkerPrefix).toLong).toOption)
      .toSeq
  }

  /** Resolve the live data directory under `root`: the highest committed
    * version. The version is carried in the marker FILENAME, so resolve
    * never opens a file — a half-written marker body cannot be observed.
    * Bounded retry on a missing/empty root defends against
    * eventual-consistency windows on stores whose LIST can briefly trail
    * a PUT (and makes downstream jobs robust to racing a first
    * `writeVersioned`).
    */
  def resolve(spark: SparkSession, root: String): String = {
    var attempt = 0
    while (true) {
      // A missing root is almost always a typo or an uninitialized table,
      // not an eventual-consistency window: give it one short retry and
      // fail fast, reserving the full retry budget for the
      // root-exists-but-marker-not-yet-listed case.
      var rootMissing = false
      val vs =
        try committedVersions(spark, root)
        catch { case _: FileNotFoundException => rootMissing = true; Seq.empty[Long] }
      if (vs.nonEmpty) return s"$root/v=${vs.max}"
      attempt += 1
      if (rootMissing && attempt >= 2)
        throw new FileNotFoundException(
          s"$root does not exist (no table root after $attempt attempts)")
      if (attempt >= 20)
        throw new FileNotFoundException(
          s"$root has no $MarkerPrefix<N> commit marker after $attempt attempts")
      Thread.sleep(25)
    }
    throw new IllegalStateException("unreachable")
  }

  private def currentVersion(spark: SparkSession, root: String): Long = {
    val dir = resolve(spark, root)
    dir.substring(dir.lastIndexOf("v=") + 2).toLong
  }

  /** Publish version `v`: create the immutable `_committed_v=N` marker.
    * The atomic primitive is directory-entry creation — no rename, no
    * overwrite of a live file, valid on local FS, HDFS, and object
    * stores. The body records the version for humans; readers never
    * parse it.
    */
  private[sources] def commitMarker(spark: SparkSession, root: String, v: Long): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(root, MarkerPrefix + v)
    // create-once (overwrite=false): a second publisher of the same
    // version fails loudly instead of silently re-publishing — markers
    // are immutable, matching the nothing-is-ever-overwritten contract
    val out = fs.create(marker, false)
    try out.write(s"v=$v".getBytes("UTF-8")) finally out.close()
  }

  /** Initialize a versioned table root: write the frame as `v=0` and
    * commit it. INIT-ONLY by design: resolve takes the MAX committed
    * version, so re-initializing a root that already has committed
    * versions would write data no reader ever sees — fail loudly
    * instead of losing the write silently.
    */
  def writeVersioned(df: org.apache.spark.sql.DataFrame, root: String): Unit = {
    val existing =
      try committedVersions(df.sparkSession, root)
      catch { case _: FileNotFoundException => Seq.empty[Long] }
    require(existing.isEmpty,
      s"writeVersioned: $root already has committed versions ${existing.sorted}; " +
        "use compactVersioned to advance an initialized table")
    df.write.mode("overwrite").parquet(s"$root/v=0")
    commitMarker(df.sparkSession, root, 0)
  }

  /** Publish `df` as the next version of an initialized table root:
    * write `v=N+1`, create its commit marker, retire versions more than
    * `grace` generations behind. The general versioned-advance primitive
    * — [[compactVersioned]] is this with a coalesce transform, and a CDC
    * MERGE ([[graft.ops.Cdc.mergeVersioned]]) is this with an
    * applyChanges transform. Same crash-safety as compactVersioned: a
    * failure before the marker leaves readers on `v=N` and the orphan
    * dir is overwritten by the next publish.
    *
    * @return the published version number.
    */
  def publishNext(df: org.apache.spark.sql.DataFrame, root: String,
                  grace: Int = 1): Long = {
    require(grace >= 1, s"grace must be >= 1, got $grace")
    val spark = df.sparkSession
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = currentVersion(spark, root)
    val next = new Path(s"$root/v=${cur + 1}")
    fs.delete(next, true)
    df.write.mode("overwrite").parquet(next.toString)
    commitMarker(spark, root, cur + 1)
    retireOld(spark, root, cur, grace)
    cur + 1
  }

  /** Retire committed versions more than `grace` generations behind head
    * version `cur + 1` (marker first, then data, so a concurrent resolve
    * can never select a version whose data is mid-delete).
    */
  private def retireOld(spark: SparkSession, root: String,
                        cur: Long, grace: Int): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    committedVersions(spark, root)
      .filter(_ <= cur - grace)
      .foreach { v =>
        fs.delete(new Path(root, MarkerPrefix + v), false)
        fs.delete(new Path(s"$root/v=$v"), true)
      }
  }

  /** Compact the live version into `v=N+1` and publish it by creating its
    * commit marker. Versions more than `grace` generations behind the new
    * head are retired (marker first, then data, so a concurrent resolve
    * can never select a version whose data is mid-delete); keeping
    * `grace ≥ 1` lets readers holding a just-stale resolution finish
    * their scan. Crash-safe: a failure after writing `v=N+1` data but
    * before its marker leaves readers on `v=N`, and the next compaction
    * overwrites the uncommitted orphan dir. Single-compactor contract
    * (the reference's housekeeping jobs were singletons too): concurrent
    * compactions of one root can both target `v=N+1` and interleave
    * writes into it — readers still never break (they only see committed
    * markers and max-version resolution), and the create-once marker
    * ensures the second publisher of `v=N+1` fails loudly instead of
    * silently double-committing — but run one compactor per table.
    *
    * @return (filesBefore, filesAfter) part-file counts.
    */
  def compactVersioned(spark: SparkSession, root: String,
                       targetFileBytes: Long = 128L * 1024 * 1024,
                       grace: Int = 1): (Int, Int) = {
    require(grace >= 1, s"grace must be >= 1, got $grace")
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
    commitMarker(spark, root, cur + 1)
    retireOld(spark, root, cur, grace)
    (before.length, after)
  }
}
