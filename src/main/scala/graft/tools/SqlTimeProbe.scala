package graft.tools

import graft.GraftSession

/** Per-expression-arm timing probe: registers the graft_* SQL surface
  * and the testdata views, then times each argument SQL with the
  * min-of-2 noop-sink protocol — for attributing a composite scan-side
  * query's cost to its individual expression arms (guide §1.2: fix the
  * per-task work only once the job shape is right, and know WHICH work).
  * Usage: dev/run.sh graft.tools.SqlTimeProbe <sfDir> "SELECT ..." ...
  */
object SqlTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.builder("graft-sqltimeprobe", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sql.GraftSql.register(spark)
    graft.Tables.registerAll(spark, sfDir)
    graft.Tables.names.foreach(t => graft.Tables.load(spark, sfDir, t)
      .write.format("noop").mode("overwrite").save())
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    args.tail.foreach { sql =>
      def once(): Double = time(
        spark.sql(sql).write.format("noop").mode("overwrite").save())
      val t = math.min(once(), once())
      println(f"$t%8.3f s  ${sql.linesIterator.next().take(90)}")
    }
    spark.stop()
  }
}
