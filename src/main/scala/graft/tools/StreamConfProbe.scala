package graft.tools

import graft.{GraftSession, Queries, Tables}

/** A/B probe for streaming state-partition sizing (measurement only —
  * no production behavior changes): time named registry queries with
  * `spark.sql.shuffle.partitions` forced to a given value before the
  * wrappers run their micro-batch pipelines. Streaming stateful
  * operators cannot use AQE partition coalescing, so the state-store
  * partition count is whatever this conf says at checkpoint-creation
  * time — this probe quantifies what that costs at a given input size.
  * Same min-of-2 noop-sink methodology as [[TimeQuery]].
  *
  * Usage: dev/run.sh graft.tools.StreamConfProbe <sfDir> <parts> <query...>
  * (parts <= 0 keeps the session default, i.e. the control arm)
  */
object StreamConfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val parts = args(1).toInt
    val spark = GraftSession.builder("graft-streamconfprobe", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warm-up as Bench: page cache + JIT out of the measurement
    Tables.names.foreach(t => Tables.load(spark, sfDir, t)
      .write.format("noop").mode("overwrite").save())
    if (parts > 0) spark.conf.set("spark.sql.shuffle.partitions", parts)
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    args.drop(2).foreach { name =>
      val fn = Queries.queries(name)
      def once(): Double = time(
        fn(spark, sfDir).write.format("noop").mode("overwrite").save())
      val t = math.min(once(), once())
      println(f"$name%-24s parts=$parts%-4d $t%.3f s")
    }
    spark.stop()
  }
}
