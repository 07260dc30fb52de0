package graft.tools

import graft.{GraftSession, Queries}

/** Formatted physical plans for named registry queries — the per-operator
  * plan-audit loop (broadcast vs shuffle sides, pushed filters, codegen
  * spans) without writing a one-off driver.
  * Usage: dev/run.sh graft.tools.ExplainQuery <sfDir> <query> [query...]
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.builder("graft-explain", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println(s"==== $name ====")
      Queries.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
