package graft.tools

import graft.{Bench => _, GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnose bench-pair asymmetry: run one headline ours/control pair in
  * strict alternation many times and print every slot's time in sequence.
  * If times track SLOT POSITION (monotonic drift within the sequence)
  * rather than SIDE, the ratio gap is measurement, not plans. Also dumps
  * normalized physical plans for both sides.
  * Usage: dev/run.sh graft.tools.PairProbe <sfDir> <b1|b3> [1x|10x] [nAlt]
  */
object PairProbe {
  def norm(df: DataFrame): String = df.queryExecution.executedPlan
    .toString.replaceAll("#\\d+L?", "#x").replaceAll("plan_id=\\d+", "plan_id=x")
    .replaceAll("\\bid=#?\\d+\\b", "id=x")

  def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which = args(1)
    val scale = if (args.length > 2) args(2) else "1x"
    val nAlt = if (args.length > 3) args(3).toInt else 6
    val spark = GraftSession.builder("graft-pairprobe", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(t => exec(Tables.load(spark, sfDir, t)))

    def li: DataFrame =
      if (scale == "10x") {
        val base = Tables.load(spark, sfDir, "lineitem")
        base.crossJoin(spark.range(10).select(col("id").as("_k")))
          .withColumn("l_orderkey", col("l_orderkey") + col("_k") * lit(1000000000L))
          .drop("_k")
      } else Tables.load(spark, sfDir, "lineitem")
    li.createOrReplaceTempView("li_probe")
    val part = Tables.load(spark, sfDir, "part")
    part.createOrReplaceTempView("part_probe")

    val (ours, ctl): (DataFrame, DataFrame) = which match {
      case "b1" => (
        {
          val s1 = li.where(substring(md5((col("l_orderkey") * 8 + col("l_linenumber"))
              .cast("string")), 1, 1).isin("0", "1"))
            .groupBy("l_partkey")
            .agg(sum(col("l_quantity").cast("long")).as("qty"),
              sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("rev_cents"))
          s1.join(broadcast(part), col("l_partkey") === col("p_partkey"))
            .groupBy("p_brand")
            .agg(sum(col("rev_cents")).as("revenue_cents"), count(lit(1)).as("nparts"))
            .orderBy(col("revenue_cents").desc, col("p_brand")).limit(10)
        },
        spark.sql("""
          WITH s1 AS (
            SELECT l_partkey, sum(CAST(l_quantity AS BIGINT)) AS qty,
                   sum(CAST(round(l_extendedprice*100, 0) AS BIGINT)) AS rev_cents
            FROM li_probe
            WHERE substr(md5(CAST(l_orderkey*8 + l_linenumber AS STRING)), 1, 1) IN ('0','1')
            GROUP BY 1),
          s2 AS (
            SELECT p_brand, sum(rev_cents) AS revenue_cents, count(1) AS nparts
            FROM s1 JOIN part_probe ON l_partkey = p_partkey GROUP BY 1)
          SELECT * FROM s2 ORDER BY revenue_cents DESC, p_brand LIMIT 10"""))
      case "b3" => (
        li.where(substring(md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"))), 1, 2)
          .isin("00")).coalesce(1),
        spark.sql("""SELECT * FROM li_probe
          WHERE substr(md5(concat_ws('|', l_orderkey, l_linenumber)), 1, 2) = '00'""")
          .coalesce(1))
    }

    val (op, cp) = (norm(ours), norm(ctl))
    println(s"== PLAN MATCH: ${op == cp} ==")
    if (op != cp) {
      println("---- OURS ----"); println(op)
      println("---- CTL ----"); println(cp)
    }

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    // mimic Bench.hygiene
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    // strict alternation, ctl first (same as the bench's slot 1)
    val slots = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    (1 to nAlt).foreach { i =>
      slots += (("ctl", time(exec(ctl))))
      slots += (("ours", time(exec(ours))))
    }
    slots.zipWithIndex.foreach { case ((side, t), i) =>
      println(f"slot ${i + 1}%2d  $side%-5s ${t}%.3f s")
    }
    val cmin = slots.filter(_._1 == "ctl").map(_._2).min
    val omin = slots.filter(_._1 == "ours").map(_._2).min
    println(f"min ctl=$cmin%.3f ours=$omin%.3f ratio=${omin / cmin}%.2f")
    spark.stop()
  }
}
