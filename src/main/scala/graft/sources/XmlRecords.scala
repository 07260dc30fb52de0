package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pattern-delimited record reader — the reference's
  * `StreamXmlRecordReader` (`/root/reference/src/contrib/streaming/src/java/org/apache/hadoop/streaming/StreamXmlRecordReader.java`):
  * records are byte ranges between a `begin` and `end` pattern, possibly
  * spanning lines.
  *
  * Two paths:
  *  - [[read]]: per-file (`wholeTextFiles`) — fine for the usual XML-dump
  *    layout of many medium files, but one task and one in-memory string
  *    PER FILE, so a single giant file is both serial and an OOM hazard;
  *  - [[readSplittable]]: the reference's boundary-scan trick over BYTE
  *    RANGE splits — the driver slices each file into ranges from
  *    metadata alone, and each task seeks to its range start and scans
  *    forward for the begin pattern. A task owns exactly the records
  *    whose begin tag STARTS inside its range (it reads past the range
  *    end to finish the last one), so ownership is disjoint and total,
  *    a 10 GB file becomes ~640 parallel tasks at the default split, and
  *    task memory is bounded by the split size + one record, never the
  *    file.
  *
  * Shared semantic contract (same as the reference's fast path): records
  * do not nest and the begin pattern does not occur inside a record
  * body — pattern occurrences ARE delimiters, exactly as the per-file
  * regex treats them.
  */
object XmlRecords {

  /** Extract every `begin...end` delimited record from each file as one
    * row (`file`, `record` — record text includes the delimiters, like
    * the reference).
    */
  def read(spark: SparkSession, path: String, begin: String, end: String): DataFrame = {
    import spark.implicits._
    val files = spark.sparkContext.wholeTextFiles(path)
    val b = java.util.regex.Pattern.quote(begin)
    val e = java.util.regex.Pattern.quote(end)
    val pattern = s"(?s)$b.*?$e".r
    files.flatMap { case (file, content) =>
      pattern.findAllIn(content).map(rec => (file, rec))
    }.toDF("file", "record")
  }

  /** Extract a single tag's text content from each record (the typical
    * downstream projection).
    */
  def tagText(record: org.apache.spark.sql.Column, tag: String): org.apache.spark.sql.Column =
    regexp_extract(record, s"<$tag>(.*?)</$tag>", 1)

  /** KMP streaming matcher: feed bytes one at a time, `feed` returns true
    * exactly when the last byte completes a pattern occurrence.
    * Occurrences are non-overlapping (state resets after a match) — the
    * same contract as the per-file path's `findAllIn`. The failure
    * function is for FAILED partial matches: a naive reset-on-mismatch
    * scanner misses `<rec>` in `<re<rec>` because it throws away the
    * re-usable `<re` prefix; KMP falls back instead of resetting.
    */
  private final class KmpMatcher(pattern: Array[Byte]) extends Serializable {
    private val fail: Array[Int] = {
      val f = new Array[Int](pattern.length)
      var k = 0
      for (i <- 1 until pattern.length) {
        while (k > 0 && pattern(k) != pattern(i)) k = f(k - 1)
        if (pattern(k) == pattern(i)) k += 1
        f(i) = k
      }
      f
    }
    private var matched = 0
    def reset(): Unit = matched = 0
    def feed(b: Byte): Boolean = {
      while (matched > 0 && pattern(matched) != b) matched = fail(matched - 1)
      if (pattern(matched) == b) matched += 1
      if (matched == pattern.length) { matched = 0; true } else false
    }
  }

  /** One byte-range's records: seek to `start`, scan for begin-pattern
    * occurrences, and emit each `begin..end` span whose begin pattern
    * STARTS in `[start, rangeEnd)` — reading past `rangeEnd` to finish
    * the last owned record, and leaving any record that starts at or
    * after `rangeEnd` to the next range's task. A range that opens
    * mid-record simply scans past the tail bytes to the next begin
    * pattern (those bytes belong to a record the previous range owns).
    * Returns the materialized records — bounded by the range size plus
    * one record, the memory contract that replaces `wholeTextFiles`'
    * whole-file string.
    */
  private def scanRange(fs: org.apache.hadoop.fs.FileSystem,
                        file: org.apache.hadoop.fs.Path,
                        start: Long, rangeEnd: Long,
                        begin: Array[Byte], endPat: Array[Byte],
                        maxRecordBytes: Int): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val in = fs.open(file)
    try {
      in.seek(start)
      val buf = new java.io.BufferedInputStream(in, 128 * 1024)
      var pos = start
      val bm = new KmpMatcher(begin)
      val em = new KmpMatcher(endPat)
      var done = false
      while (!done) {
        // scan for the next begin-pattern occurrence
        bm.reset()
        var matchEnd = -1L
        while (matchEnd < 0 && !done) {
          val c = buf.read()
          if (c < 0) done = true // EOF before another begin: range drained
          else {
            pos += 1
            if (bm.feed(c.toByte)) matchEnd = pos
          }
        }
        if (!done) {
          if (matchEnd - begin.length >= rangeEnd) done = true // next range owns it
          else {
            // collect begin..end inclusive
            val bytes = new java.io.ByteArrayOutputStream(1024)
            bytes.write(begin, 0, begin.length)
            em.reset()
            var closed = false
            while (!closed && !done) {
              val c = buf.read()
              if (c < 0) done = true // EOF inside a record: malformed tail, drop
              else {
                pos += 1
                bytes.write(c)
                if (bytes.size > maxRecordBytes)
                  throw new IllegalStateException(
                    s"record at $file:${matchEnd - begin.length} exceeds " +
                      s"$maxRecordBytes bytes before '${new String(endPat, java.nio.charset.StandardCharsets.UTF_8)}' — " +
                      "malformed input or raise maxRecordBytes")
                if (em.feed(c.toByte)) closed = true
              }
            }
            if (closed)
              out += new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
          }
        }
      }
      out.toSeq
    } finally in.close()
  }

  /** Splittable boundary-scan reader — same output contract as [[read]]
    * (`file`, `record`, record text includes the delimiters) but with
    * byte-range parallelism WITHIN each file: the reference's
    * `StreamXmlRecordReader.seekNextRecordBoundary` trick
    * (`.../streaming/StreamXmlRecordReader.java:118`), re-expressed as a
    * driver-side metadata split plan + a distributed flatMap.
    *
    * Scale shape: listing and split planning touch metadata only; each
    * of the `ceil(len/splitBytes)` ranges per file is an independent
    * task seeking straight to its offset (HDFS/S3 positioned reads), so
    * a single 10 GB dump file engages the whole cluster and no task ever
    * materializes more than a split of bytes. `maxRecordBytes` turns a
    * lost end tag (which would otherwise silently swallow input to EOF)
    * into a loud failure.
    */
  /** A pattern's longest proper border (prefix that is also a suffix).
    * Two occurrences of a pattern can overlap iff it has a nonempty
    * border, so a borderless begin pattern has unambiguous,
    * non-overlapping occurrence starts — the property range ownership
    * needs (each task claims occurrences starting in its range; an
    * overlapping pair straddling a boundary would be claimed by BOTH
    * sides' scans).
    */
  private def longestBorder(p: Array[Byte]): Int = {
    if (p.isEmpty) return 0
    val f = new Array[Int](p.length)
    var k = 0
    for (i <- 1 until p.length) {
      while (k > 0 && p(k) != p(i)) k = f(k - 1)
      if (p(k) == p(i)) k += 1
      f(i) = k
    }
    f(p.length - 1)
  }

  def readSplittable(spark: SparkSession, path: String,
                     begin: String, end: String,
                     splitBytes: Long = 16L * 1024 * 1024,
                     maxRecordBytes: Int = 64 * 1024 * 1024): DataFrame = {
    import spark.implicits._
    require(splitBytes >= 1, s"splitBytes must be >= 1, got $splitBytes")
    require(begin.nonEmpty && end.nonEmpty,
      "begin and end patterns must be non-empty")
    val beginBytes = begin.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(longestBorder(beginBytes) == 0,
      s"begin pattern '$begin' overlaps itself (a proper prefix equals a " +
        "suffix), so occurrences can straddle a range boundary ambiguously " +
        "and two tasks would claim overlapping records — use a borderless " +
        "begin pattern (an XML tag like <rec> always is)")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val statuses = Option(fs.globStatus(root)).getOrElse(
      throw new java.io.FileNotFoundException(
        s"readSplittable: input path does not exist: $path"))
    val files = statuses.toSeq.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.filter { f =>
          val n = f.getPath.getName
          f.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
      else Seq(st)
    }
    val ranges: Seq[(String, Long, Long)] = files.flatMap { st =>
      val len = st.getLen
      (0L until len by splitBytes).map(off =>
        (st.getPath.toString, off, math.min(off + splitBytes, len)))
    }
    // executor-side FS access rebuilds the configuration from the
    // driver's entries (Configuration itself is not serializable)
    val confMap = {
      val it = conf.iterator()
      val m = scala.collection.mutable.Map.empty[String, String]
      while (it.hasNext) { val e = it.next(); m(e.getKey) = e.getValue }
      m.toMap
    }
    val beginB = begin.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val endB = end.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val maxRec = maxRecordBytes
    spark.sparkContext
      .parallelize(ranges, math.max(ranges.size, 1))
      .flatMap { case (file, off, rangeEnd) =>
        val c = new org.apache.hadoop.conf.Configuration(false)
        confMap.foreach { case (k, v) => c.set(k, v) }
        val p = new org.apache.hadoop.fs.Path(file)
        scanRange(p.getFileSystem(c), p, off, rangeEnd, beginB, endB, maxRec)
          .map(rec => (file, rec))
      }
      .toDF("file", "record")
  }
}
