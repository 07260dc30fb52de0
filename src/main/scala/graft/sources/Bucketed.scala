package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed + sorted tables — the Spark-native form of the reference's
  * map-side composite join precondition: inputs "identically partitioned
  * and sorted on the key"
  * (`/root/reference/src/mapred/org/apache/hadoop/mapred/join/CompositeInputFormat.java:48,71-96` —
  * MapFile/sorted-SequenceFile sources joined with zero shuffle at read).
  *
  * `bucketBy(n, key).sortBy(key)` persists that layout in the session
  * catalog; joins between same-bucket-count tables skip the shuffle (and
  * the sort, when buckets are sorted) — at 100 TB this converts every
  * repeated fact-fact join from a full network shuffle into local merge
  * work, which is exactly why the reference maintained presorted MapFiles.
  */
object Bucketed {

  /** Persist `df` as a bucketed, per-bucket-sorted parquet table.
    * Drops any prior table AND its managed location first (a fresh
    * in-memory metastore won't know about a previous JVM's directory).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    val sorts = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Count shuffle exchanges in the executed plan of `df` — the
    * co-location check (0 between bucketed tables of equal bucket count).
    */
  def shuffleCount(df: DataFrame): Int = {
    // Count shuffle Exchange nodes from the rendered plan: AQE's wrapper
    // hides its inner plan from TreeNode traversal, but toString renders
    // it fully (same as .explain). Broadcast exchanges excluded.
    val s = df.queryExecution.executedPlan.toString
    "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllMatchIn(s).length
  }
}
