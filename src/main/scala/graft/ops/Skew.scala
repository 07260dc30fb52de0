package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation + sampling utilities.
  *
  * The reference handled skew only by partition-count tuning and the
  * TotalOrderPartitioner's sampled split points
  * (`/root/reference/src/mapred/org/apache/hadoop/mapred/lib/InputSampler.java:49`);
  * Spark adds AQE skew-join splitting at runtime. These helpers cover the
  * remaining case — aggregation skew on hot keys — and expose the
  * InputSampler equivalent.
  */
object Skew {

  /** Two-stage salted aggregation for hot grouping keys: stage 1 groups on
    * (key, salt) spreading a hot key over `saltBuckets` tasks and computes
    * partial aggregates; stage 2 merges partials per key. Results are
    * identical to a direct groupBy for any decomposable aggregate
    * (sum/count/min/max), independent of `saltBuckets`.
    *
    * `partials` maps output column name → (stage1 agg of a value column,
    * stage2 merge of the stage1 column). E.g.
    * `("cnt", count(lit(1)), sum(col("cnt")))`.
    */
  def saltedAggregate(df: DataFrame, key: Column, saltBuckets: Int,
                      partials: Seq[(String, Column, Column)]): DataFrame = {
    // deterministic salt: spread rows without an RNG (repeatable runs)
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    val stage1 = salted.groupBy(key.as("_key"), col("_salt"))
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c, _) => c.as(n) }: _*)
    stage1.groupBy(col("_key"))
      .agg(partials.head._3.as(partials.head._1),
        partials.tail.map { case (n, _, m) => m.as(n) }: _*)
      .withColumnRenamed("_key", "key")
  }

  /** Salted equi-join for skewed join keys — the companion to
    * [[saltedAggregate]] for the case AQE's skew splitting cannot reach
    * (e.g. a skewed key feeding a shuffle-hash join whose partitions AQE
    * declines to split, or a deliberately pinned non-AQE plan). The big
    * side salts each row into one of `saltBuckets` sub-keys
    * (deterministic whole-row hash — any distribution is correct, a
    * repeatable one keeps runs comparable); the small side replicates
    * every row across ALL salts, so (key, salt) equi-matches reproduce
    * exactly the unsalted inner join. A hot key's probe rows thereby
    * spread over `saltBuckets` tasks at the cost of a `saltBuckets`×
    * replication of the SMALL side only — the standard trade when the
    * small side is too big to broadcast outright but a hot build key
    * would otherwise pin one reducer.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    val b = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)),
        lit(saltBuckets.toLong)))
    val sm = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    b.join(sm, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Two-stage salted top-K per key — the capped variant of
    * [[saltedAggregate]]. Stage 1 ranks within (key, salt) keeping ≤ k
    * per salt cell; stage 2 re-ranks the ≤ k·saltBuckets survivors.
    * Because rank-k survivors of the whole key are necessarily rank-≤k
    * within their salt bucket, the result is IDENTICAL to the direct
    * window for any `saltBuckets`.
    *
    * MEASURED FINDING (d15, SCALING.md): on Spark 4 this is REDUNDANT —
    * `InferWindowGroupLimit` already rewrites a `row_number() <= k`
    * filter into a partial-mode `WindowGroupLimit` before the exchange
    * (a bounded per-key heap on the map side), so the direct window ships
    * ≤ k rows per key per input partition and beats this two-stage form
    * ~2× on a staged hot-domain table. Prefer the plain window
    * (q_domain_cap does); this helper stays as the documented shape for
    * engines/contexts WITHOUT rank-limit pushdown — e.g. a `rank`-free
    * bounded selection under an aggregate, or Spark < 3.5 — and as the
    * provably-equivalent reference the d15 trend measures against.
    *
    * `order` must be a total order (include a unique tiebreak column) or
    * the kept set is engine-dependent; `saltOn` should be a deterministic
    * per-row expression (e.g. the tiebreak id) so runs are repeatable.
    */
  def saltedTopKPerKey(df: DataFrame, key: Column, saltOn: Column, k: Int,
                       order: Seq[Column], saltBuckets: Int = 8,
                       rankCol: String = "rnk"): DataFrame = {
    require(k >= 1 && saltBuckets >= 1, "k and saltBuckets must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val salted = df.withColumn("_salt",
      pmod(xxhash64(saltOn), lit(saltBuckets.toLong)))
    val w1 = Window.partitionBy(key, col("_salt")).orderBy(order: _*)
    val survivors = salted
      .withColumn("_r1", row_number().over(w1))
      .where(col("_r1") <= k)
      .drop("_r1", "_salt")
    val w2 = Window.partitionBy(key).orderBy(order: _*)
    survivors.withColumn(rankCol, row_number().over(w2))
      .where(col(rankCol) <= k)
  }

  /** Sampled range split points — the `InputSampler` analog, exposed via
    * `approxQuantile` (Spark's RangePartitioner uses the same reservoir
    * sampling internally under `orderBy`).
    */
  def splitPoints(df: DataFrame, column: String, numPartitions: Int,
                  relativeError: Double = 0.01): Array[Double] = {
    val probs = (1 until numPartitions).map(_.toDouble / numPartitions).toArray
    df.stat.approxQuantile(column, probs, relativeError)
  }
}
