package graft.tools

import graft.{ExtraQueries, GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.DataFrame

/** Fresh-JVM timing probe for suite queries whose Bench readings moved
  * between rounds: runs each named query N times with the same per-query
  * hygiene Bench applies and prints every reading. Bench's suite numbers
  * are single-shot inside a ~90-query-old JVM — the documented long-JVM
  * drift is up to 3.75x on an identical plan — so a fresh-JVM reading
  * that reproduces the PREVIOUS round's number clears a moved reading as
  * position noise; one that reproduces the regression means the plan
  * really changed.
  * Usage: dev/run.sh graft.tools.StreamProbe <sfDir> <query> [query ...]
  */
object StreamProbe {
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(fn: => Unit): Double = {
    val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = GraftSession.builder("graft-streamprobe", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(t => exec(Tables.load(spark, sfDir, t)))
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val f = new java.io.File(ExtraQueries.scratchRoot)
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) Option(x.listFiles()).foreach(_.foreach(rm))
        x.delete()
      }
      rm(f)
      System.gc()
      Thread.sleep(50)
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val runs = (1 to 3).map { i =>
        hygiene()
        val t = time(exec(fn(spark, sfDir)))
        println(f"$n%-24s run$i  $t%.3f s")
        t
      }
      println(f"$n%-24s min   ${runs.min}%.3f s")
    }
    spark.stop()
  }
}
