package graft

/** Plan inspector: prints the formatted physical plan for named queries.
  * Usage: dev/run.sh graft.Explain <sfDir> <query> [query...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.builder("graft-explain", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println(s"========== $name ==========")
      Queries.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
