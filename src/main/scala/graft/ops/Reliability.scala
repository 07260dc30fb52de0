package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Poison-record handling + job counters.
  *
  * SkipBadRecords (`/root/reference/src/mapred/org/apache/hadoop/mapred/SkipBadRecords.java:51`)
  * re-runs failing tasks binary-searching for poison records and skips
  * them, logging skipped ranges to `_logs/skip`. That design only makes
  * sense when a record can kill a whole JVM task; in Spark the failure
  * unit is an expression/UDF call, so the scale-correct analog is: wrap
  * the fallible transform so it yields (result, error) per record, route
  * errors to a quarantine sink, and count them — no task re-runs, no
  * binary search, one pass.
  *
  * Counters/Reporter (`mapred/Counters.java:53`) → `df.observe` metrics
  * (collected once per action with zero extra passes) via
  * [[org.apache.spark.sql.Observation]].
  */
object Reliability {

  final case class SafeResult(result: String, error: String)

  /** Wrap a fallible String→String function into a safe UDF producing
    * struct(result, error): exactly one of the two is null per record.
    */
  def safeUdf(f: String => String): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (in: String) =>
      // NonFatal only: OOM/StackOverflow/interrupts must still kill the
      // task (swallowing them would mask JVM failure and break Spark's
      // task cancellation), exactly like the reference's skip logic only
      // caught record-level processing exceptions.
      try SafeResult(f(in), null)
      catch { case scala.util.control.NonFatal(e) =>
        SafeResult(null, s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }

  final case class Routed(good: DataFrame, bad: DataFrame)

  /** Apply a fallible transform to `in`, producing `out` on the good side
    * and (input, error) rows on the bad side. One pass over the data per
    * side; callers write `bad` to their quarantine sink (the `_logs/skip`
    * analog).
    */
  def routeBadRecords(df: DataFrame, in: Column, f: String => String,
                      out: String = "out"): Routed = {
    val applied = df.withColumn("_r", safeUdf(f)(in))
    Routed(
      good = applied.where(col("_r.error").isNull)
        .withColumn(out, col("_r.result")).drop("_r"),
      bad = applied.where(col("_r.error").isNotNull)
        .withColumn("error", col("_r.error")).drop("_r"))
  }

  /** Run an action with observed per-query metrics (the Counters analog):
    * returns (rows written to fn's sink is caller's business; metrics map).
    * Metrics cost nothing extra — they ride the existing pass.
    */
  def withCounters(df: DataFrame, metrics: (String, Column)*)(action: DataFrame => Unit)
      : Map[String, Any] = {
    val obs = Observation()
    val first +: rest = metrics.map { case (n, c) => c.as(n) }: @unchecked
    val observed = df.observe(obs, first, rest: _*)
    action(observed)
    obs.get
  }
}
