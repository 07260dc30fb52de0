package graft.tools

import graft.GraftSession

/** One-off SQL probe: runs each argument as SQL and prints the result —
  * used to pin down parser/escaping behavior empirically (e.g. how string
  * literals unescape under the session's ANSI setting).
  * Usage: dev/run.sh graft.tools.SqlProbe "SELECT ..." ...
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-sqlprobe", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (opts, sqls) = args.partition(_.startsWith("--tables="))
    opts.foreach(o => graft.Tables.registerAll(spark, o.stripPrefix("--tables=")))
    sqls.foreach { sql =>
      println(s"== $sql")
      spark.sql(sql).show(20, truncate = false)
    }
    spark.stop()
  }
}
