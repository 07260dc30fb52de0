package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.ops.Checkpoints

/** Phase-level timing for the PageRank loop (r9 flagged an unattributed
  * q_pagerank wall-clock move; the decomposition this probe produced
  * showed `nodes`/`outdeg` being recomputed from raw edges inside every
  * iteration's lazily-materialized dangling broadcast — fixed by
  * carrying deg in the rank table, see PageRank.pageRankTracked).
  * Mirrors the current loop structure with a stopwatch between stages.
  * Usage: dev/run.sh graft.tools.PrProbe [sfDir] [iters]
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.builder("graft-pr-probe", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.load(spark, sfDir, "lineitem")
      .write.format("noop").mode("overwrite").save() // page-cache warmup
    def time[A](tag: String)(fn: => A): A = {
      val t0 = System.nanoTime()
      val a = fn
      println(f"$tag%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val edgesRaw = Tables.load(spark, sfDir, "lineitem").select(
      concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
      concat(lit("p"), col("l_partkey").cast("string")).as("dst"))
    val edges = edgesRaw.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst")).distinct()
    val outdeg = edges.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
    val weT = time("setup_edge_ckpt")(Checkpoints.truncateTracked(
      edges.join(outdeg, "src").select("src", "dst", "deg"), eager = true))
    val we = weT.df
    val srcDeg = we.select(col("src").as("node"), col("deg")).distinct()
    val ndT = time("setup_nodes_ckpt")(Checkpoints.truncateTracked(
      srcDeg.unionByName(
        we.select(col("dst").as("node")).distinct()
          .join(srcDeg.select("node"), Seq("node"), "left_anti")
          .withColumn("deg", lit(null).cast("double"))),
      eager = true))
    val nodesDeg = ndT.df
    val nScalar = broadcast(nodesDeg.agg(count(lit(1)).cast("double").as("_n")))
    var r = nodesDeg.crossJoin(nScalar)
      .select(col("node"), col("deg"), round(lit(1.0) / col("_n"), 9).as("r"))
    var releasePrev: () => Unit = () => ()
    for (i <- 1 to iters) {
      val contrib = we.join(r.select("node", "r"), col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(round(sum(col("r") / col("deg")), 9).as("contrib"))
        .select(col("dst").as("node"), col("contrib"))
      val dangling = time(s"iter${i}_dangling")(broadcast(
        r.where(col("deg").isNull)
          .agg(coalesce(round(sum(col("r")), 9), lit(0.0)).as("_mass"))))
      val nextT = time(s"iter${i}_ckpt")(Checkpoints.truncateTracked(
        nodesDeg.join(contrib, Seq("node"), "left")
          .crossJoin(nScalar).crossJoin(dangling)
          .select(col("node"), col("deg"),
            round(lit(0.15) / col("_n") + lit(0.85) *
              (coalesce(col("contrib"), lit(0.0)) + col("_mass") / col("_n")),
              9).as("rank")),
        eager = true))
      releasePrev()
      releasePrev = nextT.release
      r = nextT.df.withColumnRenamed("rank", "r")
    }
    time("final_exec")(r.select(col("node"), col("r").as("rank"))
      .write.format("noop").mode("overwrite").save())
    weT.release(); ndT.release(); releasePrev()
    spark.stop()
  }
}
