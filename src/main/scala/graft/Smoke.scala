package graft

/** Local smoke main mirroring the driver's t1 check: SparkEntry.entry
  * must return rows > 0 on sf0.001.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-smoke", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"entry rows = $n")
    assert(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
