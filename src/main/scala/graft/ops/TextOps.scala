package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text map/transform operators from the reference's `mapred/lib` +
  * examples, re-expressed as codegen-friendly Column pipelines.
  *
  * - `TokenCountMapper` (`/root/reference/src/mapred/org/apache/hadoop/mapred/lib/TokenCountMapper.java:38`):
  *   tokenize → (token, 1) → sum. Spark: explode(split) + groupBy.count —
  *   Catalyst plans the map-side partial aggregate that the reference needed
  *   an explicit Combiner for.
  * - `RegexMapper` (`.../lib/RegexMapper.java:35`): emit a regex group for
  *   every match → count. Spark: explode(regexp_extract_all).
  * - Grep pipeline (`/root/reference/src/examples/org/apache/hadoop/examples/Grep.java:34-90`):
  *   two chained MR jobs (extract+count, then single-reducer sort-desc);
  *   here a single plan — partial agg + TakeOrderedAndProject replace the
  *   1-reducer global sort.
  * - `InverseMapper` (`.../lib/InverseMapper.java:33`): (k,v) → (v,k).
  */
object TextOps {

  /** Whitespace tokenization, empty tokens dropped (StringTokenizer
    * semantics in the reference — no empty tokens).
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > lit(0))

  /** token → count, descending by count then token (deterministic). */
  def wordCount(df: DataFrame, text: Column): DataFrame =
    df.select(explode(tokens(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** All matches of `pattern` group `group` per row, exploded. */
  def regexMatches(text: Column, pattern: String, group: Int = 0): Column =
    explode(regexp_extract_all(text, lit(pattern), lit(group)))

  /** Grep: extract all matches, count per match, order desc — the
    * reference's 2-job pipeline as one plan.
    */
  def grep(df: DataFrame, text: Column, pattern: String, group: Int = 0): DataFrame =
    df.select(regexMatches(text, pattern, group).as("match"))
      .groupBy("match").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("match"))

  /** (key, value) → (value, key). */
  def inverse(df: DataFrame, key: String = "key", value: String = "value"): DataFrame =
    df.select(col(value).as(key), col(key).as(value))
}
