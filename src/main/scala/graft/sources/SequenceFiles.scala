package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SequenceFile compatibility bridge — the reference's native binary KV
  * container (`/root/reference/src/core/org/apache/hadoop/io/SequenceFile.java:186`;
  * input/output formats `mapred/SequenceFileInputFormat.java`,
  * `SequenceFileOutputFormat.java:41`).
  *
  * Parquet is our native storage; this bridge exists so existing
  * SequenceFile datasets can be read (and written for
  * interop) without conversion jobs. Text-keyed/valued files map to
  * `Dataset[(String, String)]`; other Writables go through
  * `sequenceFile[K, V]` with the appropriate Hadoop classes (the jars
  * ship with Spark).
  *
  * Splittability note: SequenceFiles carry sync markers every ~2 KB, so
  * Spark splits them by HDFS block exactly like the reference did — the
  * bridge keeps full scan parallelism at cluster scale.
  */
object SequenceFiles {

  /** Read a Text/Text SequenceFile as a (key, value) DataFrame. */
  def readKV(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile[String, String](path).toDF("key", "value")
  }

  /** Write the first two (string-castable) columns as a Text/Text
    * SequenceFile.
    */
  def writeKV(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val Array(k, v) = df.columns.take(2)
    df.select(col(k).cast("string"), col(v).cast("string"))
      .as[(String, String)].rdd.saveAsSequenceFile(path)
  }

  /** Read a LongWritable-keyed SequenceFile (e.g. offsets) as (long, string). */
  def readLongText(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile[Long, String](path).toDF("key", "value")
  }
}
