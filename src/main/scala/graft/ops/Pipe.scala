package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hadoop-Streaming-style external-process operator.
  *
  * Re-expresses the reference's streaming contract
  * (`/root/reference/src/contrib/streaming/src/java/org/apache/hadoop/streaming/PipeMapRed.java:342-355`,
  * `StreamJob.java:360-418`): records cross the subprocess boundary as
  * `key<sep>value\n` lines; output lines split on the first
  * `numKeyFields` separators back into (key, value); a line with no
  * separator becomes (line, "") — the reference's whole-line-key case.
  *
  * Spark-first: `RDD.pipe` under a DataFrame facade (SQL surface would be
  * `SELECT TRANSFORM ... USING`, which Spark also supports natively).
  * Each partition forks one subprocess — at cluster scale that is one
  * process per task, same as the reference's one per map/reduce task.
  */
object Pipe {

  /** Render (key, value) columns to the line protocol, pipe through `cmd`,
    * parse back. `numKeyFields` mirrors `stream.num.map.output.key.fields`:
    * the key is everything before the numKeyFields-th separator.
    *
    * `sep` is the INPUT separator (`stream.map.input.field.separator`) used
    * to render rows into the subprocess; `outSep`
    * (`stream.map.output.field.separator`) is what the subprocess's output
    * lines are split on — the reference keeps them independent
    * (`PipeMapRed.java:342-355`, exercised by `TestStreamingSeparator`).
    * DELIBERATE DEVIATION: the reference defaults BOTH to '\t'
    * independently (`PipeMapper.java:73-74`); here `outSep` defaults to
    * `sep`, because the common non-tab case is an echo-style command that
    * emits the same separator it was fed — callers matching the exact
    * reference config should pass `outSep = "\t"` explicitly.
    *
    * Null columns render as explicit empty fields (the reference writes
    * every field positionally; `concat_ws` alone would silently drop the
    * separator of a null field and shift all later fields).
    */
  def pipe(df: DataFrame, cmd: Seq[String], sep: String = "\t",
           numKeyFields: Int = 1, env: Map[String, String] = Map.empty,
           outSep: String = null): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // array columns splice their elements with the separator (the multi-
    // field line-protocol rendering); a bare cast would emit '[a, b]'
    val rendered = df.schema.fields.map { f =>
      val c = f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType =>
          array_join(transform(col(f.name), e =>
            coalesce(e.cast("string"), lit(""))), sep)
        case _ => col(f.name).cast("string")
      }
      coalesce(c, lit(""))
    }
    val lines = df.select(concat_ws(sep, rendered: _*).as("line"))
      .as[String]
    val piped = lines.rdd.pipe(cmd, env)
    val parseSep = Option(outSep).getOrElse(sep)
    piped.toDF("line").select(
      splitKeyValue(col("line"), parseSep, numKeyFields): _*)
  }

  /** (key, value) columns from a line: key = first `numKeyFields` fields,
    * value = rest; no separator → (line, "").
    */
  def splitKeyValue(line: org.apache.spark.sql.Column, sep: String,
                    numKeyFields: Int): Seq[org.apache.spark.sql.Column] = {
    val q = java.util.regex.Pattern.quote(sep)
    val fields = split(line, q, -1)
    val key = array_join(slice(fields, lit(1), lit(numKeyFields)), sep)
    val value = when(size(fields) > numKeyFields,
      array_join(slice(fields, lit(numKeyFields + 1),
        greatest(size(fields) - numKeyFields, lit(0))), sep))
      .otherwise(lit(""))
    Seq(key.as("key"), value.as("value"))
  }

  /** `-reducer aggregate` shortcut (`StreamJob.java:725-727`): pipe output
    * lines of form `type:id<tab>value` fold via the aggregate framework.
    */
  def aggregateReduce(kv: DataFrame): DataFrame = {
    val parts = split(col("key"), ":", 2)
    val typed = kv.select(
      get(parts, lit(0)).as("atype"),
      coalesce(get(parts, lit(1)), lit("")).as("id"),
      col("value"))
    typed.groupBy("atype", "id")
      .agg(sum(col("value").cast("double")).as("agg"))
  }
}
