package graft.tools

import graft.{GraftSession, Queries, Tables}

/** Ad-hoc timing for named registry queries (min-of-2 noop-sink runs,
  * same execution shape as Bench) — for iterating on one query's plan
  * without a full bench pass.
  * Usage: dev/run.sh graft.tools.TimeQuery <sfDir> <query> [query...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.builder("graft-timequery", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warm-up as Bench: page cache + JIT out of the measurement
    Tables.names.foreach(t => Tables.load(spark, sfDir, t)
      .write.format("noop").mode("overwrite").save())
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    args.tail.foreach { name =>
      val fn = Queries.queries(name)
      def once(): Double = time(
        fn(spark, sfDir).write.format("noop").mode("overwrite").save())
      val t = math.min(once(), once())
      println(f"$name%-24s $t%.3f s")
    }
    spark.stop()
  }
}
