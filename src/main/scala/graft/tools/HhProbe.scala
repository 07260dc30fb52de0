package graft.tools

import graft.{GraftSession, Tables}
import graft.agg.CountMin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ad-hoc heavy-hitter trend probe — the bench's d7 setup (decorrelated
  * 10x lineitem keys: distinct keys and true hitters grow 10x, per-key
  * counts stay 1x) timed for the fixed-width, width-proportional, and
  * AUTO-sized gates, without a full bench pass. For validating the
  * autoWidth sizing rule's 10x trend while iterating.
  * Usage: dev/run.sh graft.tools.HhProbe <sfDir>
  */
object HhProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.builder("graft-hhprobe", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li1x = Tables.load(spark, sfDir, "lineitem").select(col("l_partkey"))
    val li10x = li1x
      .crossJoin(spark.range(10).select(col("id").as("_k")))
      .withColumn("l_partkey", col("l_partkey") + col("_k") * lit(1000000000L))
      .drop("_k")
    li1x.write.format("noop").mode("overwrite").save() // warm cache + JIT
    li10x.write.format("noop").mode("overwrite").save()
    def time(df: => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once(); math.min(once(), once()) // burn + min-of-2, Bench's shape
    }
    val hhW = 65536
    val w1 = CountMin.autoWidth(li1x, col("l_partkey"), 42)
    val w10 = CountMin.autoWidth(li10x, col("l_partkey"), 42)
    println(s"auto widths: 1x=$w1 10x=$w10")
    val fixed1 = time(CountMin.heavyHitters(li1x, col("l_partkey"), 42, width = hhW))
    val fixed10 = time(CountMin.heavyHitters(li10x, col("l_partkey"), 42, width = hhW))
    val auto1 = time(CountMin.heavyHittersAuto(li1x, col("l_partkey"), 42))
    val auto10 = time(CountMin.heavyHittersAuto(li10x, col("l_partkey"), 42))
    println(f"fixed w=$hhW%d: 1x $fixed1%.3f s, 10x $fixed10%.3f s, trend ${fixed10 / fixed1}%.1fx")
    println(f"auto        : 1x $auto1%.3f s, 10x $auto10%.3f s, trend ${auto10 / auto1}%.1fx")
    spark.stop()
  }
}
