package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of registry queries — the
  * `.explain("formatted")` loop as a CLI: `PlanDump <sfDir> <query>...`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .appName("graft-plandump").master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try args.tail.foreach { name =>
      println(s"== $name ==")
      graft.Queries.fullRegistry(name).fn(spark, sfDir).explain("formatted")
    } finally spark.stop()
  }
}
