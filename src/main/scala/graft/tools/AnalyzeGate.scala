package graft.tools

import graft.{GraftSession, SparkEntry}

/** Analyze-only smoke gate: resolve EVERY registry query's logical plan
  * against a testdata dir without executing anything. Catches
  * driver-side data drift (column renames, dtype changes — r8 lost a
  * round to events.ts going TIMESTAMP(NANOS) → timestamp[us]) in
  * seconds instead of at bench/verify time.
  *
  * Usage: dev/run.sh graft.tools.AnalyzeGate [sfDir]
  * Exit 0 = every query analyzed; exit 1 lists the failures.
  *
  * Queries whose construction stages files / runs a stream (the
  * q_stream_* family and friends) can't be analyzed without executing
  * their setup; those run their full builder inside the same guard, so
  * a schema-drift still surfaces here — just slower. The plain ones
  * stop at `queryExecution.analyzed` (no jobs submitted).
  */
object AnalyzeGate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder("graft-analyze-gate", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Streaming/staging queries execute work in their builder; everything
    // else is pure plan construction + analysis. Analysis is eager at
    // DataFrame construction, so just building the frame is the check.
    val failures = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var n = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      n += 1
      try { fn(spark, sfDir).queryExecution.analyzed; () }
      catch { case e: Throwable =>
        failures += name -> s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(200)}"
      }
    }
    failures.foreach { case (name, msg) => println(s"ANALYZE-FAIL $name  $msg") }
    println(s"analyze gate: ${n - failures.size}/$n queries resolved on $sfDir")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
