package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** d8-shaped PageRank scale probe: times pageRank on the bench's exact
  * 1x and 10x disjoint-copy edge frames (min-of-2, noop sink) — for
  * A/B-ing iteration-shape changes at BOTH trend points without a full
  * bench pass. Usage: dev/run.sh graft.tools.PrScaleProbe [sfDir]
  */
object PrScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-pr-scale-probe", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.load(spark, sfDir, "lineitem")
      .write.format("noop").mode("overwrite").save()
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    val edges1x = Tables.load(spark, sfDir, "lineitem").select(
      concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
      concat(lit("p"), col("l_partkey").cast("string")).as("dst"))
    val edges10x = Tables.load(spark, sfDir, "lineitem")
      .crossJoin(spark.range(10).select(col("id").as("_k")))
      .select(
        concat(lit("s"), col("l_suppkey").cast("string"),
          lit("~"), col("_k")).as("src"),
        concat(lit("p"), col("l_partkey").cast("string"),
          lit("~"), col("_k")).as("dst"))
    Seq("1x" -> edges1x, "10x" -> edges10x).foreach { case (tag, e) =>
      def once(): Double = time {
        val t = graft.graph.PageRank.pageRankTracked(e, "src", "dst", iters = 3)
        t.df.write.format("noop").mode("overwrite").save()
        t.release()
      }
      val t = math.min(once(), once())
      println(f"pagerank_$tag%-6s $t%.3f s")
    }
    spark.stop()
  }
}
