package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.Pipe
import graft.sources.KVText

/** The Hadoop-Streaming job CLI — the reference's `StreamJob` flag
  * surface (`/root/reference/src/contrib/streaming/src/java/org/apache/hadoop/streaming/StreamJob.java:360-418`)
  * mapped onto the graft pipe operator:
  *
  * {{{
  * graft.cli.Stream -input <path> -output <path>
  *   -mapper '<cmd>'|NONE -reducer '<cmd>'|aggregate|NONE
  *   [-numReduceTasks n] [-cmdenv K=V]... [-separator c] [-outputseparator c]
  *   [-numKeyFields n]
  * }}}
  *
  * Semantics per the reference: input lines split on the first separator
  * into (key, value); `-mapper` pipes records through the subprocess;
  * between map and reduce the records are partitioned by key into
  * `-numReduceTasks` partitions and sorted by key within each (the
  * shuffle/sort contract reducers rely on); `-reducer aggregate` invokes
  * the aggregate framework (`StreamJob.java:725-727`) instead of a
  * subprocess; `NONE` skips a stage. `-cmdenv` exports env vars into the
  * subprocess (`StreamJob.java:297`). When `-outputseparator` is unset,
  * subprocess OUTPUT lines split on '\t' regardless of `-separator` —
  * the reference defaults the two independently (`PipeMapper.java:73-74`),
  * so a comma-separated input fed to a tab-emitting mapper parses
  * correctly. (This differs from the bare [[Pipe.pipe]] default, which
  * follows the input separator — documented at `Pipe.scala:31-35`; the
  * CLI is the reference-compat surface, so it matches the reference.)
  */
object Stream {

  final case class Conf(
    input: String = null,
    output: String = null,
    mapper: String = "NONE",
    reducer: String = "NONE",
    numReduceTasks: Int = 0,
    cmdenv: Map[String, String] = Map.empty,
    separator: String = "\t",
    outSeparator: String = null,
    numKeyFields: Int = 1)

  def parse(args: Seq[String]): Conf = {
    @annotation.tailrec
    def go(rest: List[String], c: Conf): Conf = rest match {
      case Nil => c
      case "-input" :: v :: t => go(t, c.copy(input = v))
      case "-output" :: v :: t => go(t, c.copy(output = v))
      case "-mapper" :: v :: t => go(t, c.copy(mapper = v))
      case "-reducer" :: v :: t => go(t, c.copy(reducer = v))
      case "-numReduceTasks" :: v :: t => go(t, c.copy(numReduceTasks = v.toInt))
      case "-cmdenv" :: v :: t =>
        val Array(k, value) = v.split("=", 2)
        go(t, c.copy(cmdenv = c.cmdenv + (k -> value)))
      case "-separator" :: v :: t => go(t, c.copy(separator = v))
      case "-outputseparator" :: v :: t => go(t, c.copy(outSeparator = v))
      case "-numKeyFields" :: v :: t => go(t, c.copy(numKeyFields = v.toInt))
      case other :: _ => throw new IllegalArgumentException(s"unknown flag: $other")
    }
    val c = go(args.toList, Conf())
    require(c.input != null, "-input is required")
    c
  }

  /** Whitespace command tokenization, as the reference's
    * `splitArgs` (`StreamUtil`) did — quote-free commands only; complex
    * shell goes in a script file.
    */
  private def tokenize(cmd: String): Seq[String] =
    cmd.trim.split("\\s+").toSeq

  /** Build the job's DataFrame (the testable core; `main` just writes it). */
  def plan(spark: SparkSession, c: Conf): DataFrame = {
    // the reference's independent default: output splits on '\t' unless
    // -outputseparator overrides (PipeMapper.java:73-74)
    val outSep = Option(c.outSeparator).getOrElse("\t")
    var df = KVText.readKV(spark, c.input, c.separator)
    if (c.mapper != "NONE")
      df = Pipe.pipe(df, tokenize(c.mapper), sep = c.separator,
        numKeyFields = c.numKeyFields, env = c.cmdenv, outSep = outSep)
    c.reducer match {
      case "NONE" => df
      case "aggregate" =>
        // `-reducer aggregate`: type:id keys folded by the aggregate
        // framework, rendered back to the line protocol's (key, value)
        Pipe.aggregateReduce(df)
          .select(concat_ws(":", col("atype"), col("id")).as("key"),
            col("agg").cast("string").as("value"))
      case cmd =>
        val n = if (c.numReduceTasks > 0) c.numReduceTasks
          else spark.sessionState.conf.numShufflePartitions
        // the MapReduce shuffle/sort contract: co-locate each key, feed
        // the reducer its partition's records in key order
        val shuffled = df.repartition(n, col("key"))
          .sortWithinPartitions("key")
        Pipe.pipe(shuffled, tokenize(cmd), sep = c.separator,
          numKeyFields = c.numKeyFields, env = c.cmdenv, outSep = outSep)
    }
  }

  def main(args: Array[String]): Unit = {
    val c = parse(args.toIndexedSeq)
    require(c.output != null, "-output is required")
    val spark = GraftSession.builder("graft-stream").getOrCreate()
    try KVText.writeKV(plan(spark, c), c.output, c.separator)
    finally spark.stop()
  }
}
