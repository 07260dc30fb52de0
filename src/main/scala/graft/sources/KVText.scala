package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text/KV-text sources and sinks — the reference's
  * `TextInputFormat` (`(offset, line)` records),
  * `KeyValueTextInputFormat` (line split on FIRST separator —
  * `/root/reference/src/mapred/org/apache/hadoop/mapred/KeyValueLineRecordReader.java:59`),
  * `TextOutputFormat` (`key<sep>value` lines,
  * `mapred/TextOutputFormat.java:40`), and `MultipleTextOutputFormat`
  * key-routed files (`mapred/lib/MultipleTextOutputFormat.java:33` →
  * `partitionBy`).
  */
object KVText {

  /** Lines as a 1-column `value` DataFrame (TextInputFormat; the byte
    * offset key is an implementation detail nobody's queries used).
    */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** KV-text: split each line on the FIRST separator; no separator →
    * (line, "") — exact `KeyValueLineRecordReader` semantics.
    */
  def readKV(spark: SparkSession, path: String, sep: String = "\t"): DataFrame = {
    val q = java.util.regex.Pattern.quote(sep)
    val parts = split(col("value"), q, 2)
    spark.read.text(path).select(
      get(parts, lit(0)).as("key"),
      coalesce(get(parts, lit(1)), lit("")).as("value"))
  }

  /** TextOutputFormat sink: `key<sep>value` lines. */
  def writeKV(df: DataFrame, path: String, sep: String = "\t"): Unit =
    df.select(concat_ws(sep, df.columns.map(col): _*).as("value"))
      .write.mode("overwrite").text(path)

  /** MultipleTextOutputFormat analog: route records into per-key
    * directories. At scale `partitionBy` writes one directory per key
    * value with no extra shuffle beyond the write.
    */
  def writePartitionedBy(df: DataFrame, path: String, keyCol: String): Unit =
    df.write.mode("overwrite").partitionBy(keyCol).parquet(path)
}
