package graft.cli

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Runnable example pipelines mirroring the reference's `src/examples`
  * drivers (`WordCount.java`, `Grep.java:34-90`, `Sort.java:53`,
  * `SecondarySort.java:223`, `Join.java:47-93`,
  * `AggregateWordCount.java:41`) over the driver testdata.
  *
  * Usage: dev/run.sh graft.cli.Examples <cmd> [sfDir] [outDir]
  *   cmd ∈ wordcount | grep | sort | secondarysort | join | aggwordcount
  */
object Examples {
  def main(args: Array[String]): Unit = {
    val cmd = args.headOption.getOrElse("wordcount")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 2) args(2)
      else java.nio.file.Files.createTempDirectory("graft-example").toString
    val spark = GraftSession.builder(s"example-$cmd", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = cmd match {
      case "wordcount" =>
        graft.ops.TextOps.wordCount(Tables.load(spark, sfDir, "documents"), col("text"))
      case "grep" => // 2-job reference pipeline as one plan
        graft.ops.TextOps.grep(Tables.load(spark, sfDir, "documents"),
          col("text"), "\\bs[a-z]+")
      case "sort" => // total-order sort, TotalOrderPartitioner analog
        Tables.load(spark, sfDir, "lineitem")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      case "secondarysort" =>
        Tables.load(spark, sfDir, "lineitem")
          .groupBy("l_orderkey")
          .agg(array_join(transform(array_sort(collect_list(struct(
            col("l_shipdate"), col("l_linenumber")))),
            x => x.getField("l_linenumber").cast("string")), ",").as("linenums"))
      case "join" => // -joinOp inner|outer|override equivalent (inner shown)
        graft.join.Joins.innerComposite("nationkey",
          Tables.load(spark, sfDir, "customer")
            .select(col("c_nationkey").as("nationkey"), col("c_name")),
          Tables.load(spark, sfDir, "nation")
            .select(col("n_nationkey").as("nationkey"), col("n_name")))
      case "aggwordcount" => // aggregate-framework driver shape
        graft.agg.Aggregates.aggregate(
          Tables.load(spark, sfDir, "documents")
            .select(explode(split(col("text"), "\\s+")).as("id"))
            .where(length(col("id")) > 0)
            .withColumn("value", lit(1L)),
          "LongValueSum")
      case other => sys.error(s"unknown example: $other")
    }
    out.write.mode("overwrite").parquet(s"$outDir/$cmd")
    println(s"[example] $cmd -> $outDir/$cmd (${spark.read.parquet(s"$outDir/$cmd").count()} rows)")
    spark.stop()
  }
}
