package graft.tools

import graft.{ExtraQueries, GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.DataFrame
import scala.util.control.NonFatal

/** JVM-age attribution probe for the q_stream_* suite-loop inflation
  * (r12: q_stream_attribution read 7.0→14.7 s and q_stream_join_outer
  * 6.9→12.7 s LATE in the suite loop of all three certification runs,
  * while fresh-JVM re-reads landed in band).
  *
  * Two competing hypotheses, separable by shape:
  *   (a) STREAM-SIDE accumulation — each micro-batch run leaves residue
  *       (loaded state-store providers + their maintenance thread,
  *       terminated StreamingQuery bookkeeping), so repeating the SAME
  *       stream query inflates monotonically with repeat count;
  *   (b) GENERAL JVM age — broadcast/shuffle debt from the ~200
  *       non-stream queries that precede the stream family in the
  *       alphabetical loop, in which case repeats stay flat and only
  *       an interleaved mixed workload inflates them.
  *
  * Protocol: N repeats of each named query under Bench's exact hygiene,
  * each reading printed with the count of state-store providers still
  * loaded in this JVM (the residue counter for hypothesis (a)), then —
  * with `--unload` — the same N repeats calling
  * `StateStore.unloadAll()` between runs, which drops the providers and
  * their maintenance work. Inflation that tracks the provider count and
  * disappears under --unload convicts hypothesis (a) and makes
  * unloadAll() the fix; flat readings both ways push to (b).
  *
  * Usage: dev/run.sh graft.tools.StreamAgeProbe <sfDir> <n> [--unload] <query...>
  */
object StreamAgeProbe {
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(fn: => Unit): Double = {
    val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
  }

  /** Loaded state-store provider count via the MBean-free route: the
    * StateStore companion's private map, read reflectively (diagnostic
    * only — never in a query path).
    */
  private def loadedProviders: Int = try {
    val cls = Class.forName(
      "org.apache.spark.sql.execution.streaming.state.StateStore$")
    val mod = cls.getField("MODULE$").get(null)
    val f = cls.getDeclaredField("loadedProviders")
    f.setAccessible(true)
    f.get(mod) match {
      case m: scala.collection.mutable.HashMap[_, _] => m.size
      case m: java.util.Map[_, _] => m.size
      case _ => -1
    }
  } catch { case NonFatal(_) => -1 }

  /** StateStore.unloadAll() is private[sql] at the Scala level but plain
    * public in bytecode — invoke reflectively (diagnostic-only tool).
    */
  private def unloadAll(): Unit = try {
    val cls = Class.forName(
      "org.apache.spark.sql.execution.streaming.state.StateStore$")
    val mod = cls.getField("MODULE$").get(null)
    cls.getMethod("unloadAll").invoke(mod)
  } catch { case NonFatal(e) =>
    System.err.println(s"[probe] unloadAll failed: ${e.getMessage}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val unload = args.contains("--unload")
    val names = args.drop(2).filterNot(_ == "--unload").toSeq
    val spark = GraftSession.builder("graft-streamage", 32).getOrCreate()
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
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to n).foreach { i =>
        hygiene()
        if (unload) unloadAll()
        val t = time(exec(fn(spark, sfDir)))
        println(f"$name%-24s run$i%-3d ${t}%7.3f s  providers=$loadedProviders  unload=$unload")
      }
    }
    spark.stop()
  }
}
