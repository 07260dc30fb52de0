package graft

/** Registry meta-spec: every driver-gated query must execute at sf0.001
  * and produce rows (except the known-empty anti-join/except results on
  * this data). Catches silently-broken queries before the driver round.
  */
class QueriesSpec extends SparkSpec {

  private val knownEmpty = Set("q_except")

  test("every registered query executes and returns rows at sf0.001") {
    val failures = Queries.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, sfDir).count()
        if (n == 0 && !knownEmpty(name)) Some(s"$name: empty result") else None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every query has an oracle, and oracle keys all resolve") {
    val qs = Queries.queries.keySet
    val os = Queries.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os.diff(qs)}")
    assert(qs.subsetOf(os), s"queries without oracles (weaker rows-only check): ${qs.diff(os)}")
  }

  test("entry() returns rows (driver t1 smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
