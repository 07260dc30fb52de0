package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MapFile-style keyed lookup — the reference's sorted key/value file with
  * an in-memory key index for random access
  * (`/root/reference/src/core/org/apache/hadoop/io/MapFile.java:49` — data
  * file sorted by key + index file of every 128th key), and its
  * bloom-filtered variant that skips files which cannot contain the key
  * (`/root/reference/src/core/org/apache/hadoop/io/BloomMapFile.java:45`).
  *
  * Spark-first re-expression: the persistent layout is a bucketed,
  * per-bucket-sorted parquet table ([[Bucketed.writeBucketed]] — bucket
  * pruning plays the index role: a key hashes to ONE bucket's files), and
  * the access paths are
  *  - [[lookupKeys]]: driver-known key list → an IN predicate PUSHED TO THE
  *    SCAN (`PushedFilters: [In(key, …)]`), so parquet row-group min/max
  *    stats skip pages the way MapFile's index seeks past records; with
  *    the sorted-bucket layout each key touches ~1 row group of 1 bucket.
  *  - [[lookupSemi]]: keys as a (small) DataFrame → broadcast LEFT SEMI
  *    join; the big table never shuffles, each partition probes the
  *    broadcast hash set — the distributed form of "open the MapFile,
  *    look up each requested key".
  *  - [[bloomPrefilter]]: when the key set is too large to broadcast (the
  *    semi join must shuffle BOTH sides), an approximate membership
  *    pre-filter built from the key column cuts the big side's shuffle
  *    volume to ~(hit rate + fpp) of the input first, exactly the IO that
  *    BloomMapFile's filter saved; the exact semi join afterwards removes
  *    the false positives. This mirrors what AQE's runtime bloom
  *    (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects for
  *    selective shuffle joins — provided explicitly so the pruning is a
  *    testable, plan-independent contract.
  *
  * At 100 TB: the bucketed layout is written once (one shuffle at publish
  * time), then every lookup batch is shuffle-free on the fact side —
  * the same amortization argument as maintaining sorted MapFiles.
  */
object MapLookup {

  /** Point lookup for a driver-known key list: predicate pushed to the
    * scan. Keep the list in the hundreds/thousands — beyond that, switch
    * to [[lookupSemi]].
    */
  def lookupKeys(table: DataFrame, keyCol: String, keys: Seq[Any]): DataFrame =
    table.where(col(keyCol).isin(keys: _*))

  /** Batch lookup: rows of `table` whose `keyCol` appears in
    * `keys(keysCol)`. Broadcast left-semi — ZERO shuffles end-to-end:
    * the fact side probes the broadcast hash set in place, and duplicate
    * requested keys need no dedup (a semi join never multiplies, and the
    * broadcast HashedRelation collapses them).
    */
  def lookupSemi(table: DataFrame, keyCol: String,
                 keys: DataFrame, keysCol: String): DataFrame =
    table.join(
      broadcast(keys.select(col(keysCol).as(keyCol))),
      Seq(keyCol), "left_semi")

  /** Approximate-membership pre-filter over `col(keyCol)` built from the
    * key frame — the BloomMapFile analog. Returns the filtered table; pair
    * with an exact semi join to drop the ~fpp false positives. The filter
    * is built distributed (`stat.bloomFilter` aggregates partial sketches),
    * collected once (bits ∝ expectedKeys, not table size) and applied via
    * Spark's native `BloomFilterMightContain` expression — the same
    * codegen'd predicate AQE's runtime bloom filter injects, so the
    * pre-filter stays inside whole-stage codegen rather than dropping to a
    * per-row Scala UDF.
    *
    * Type-general by construction: both sides probe on `xxhash64(key)`
    * (any atomic key dtype — long, string, binary, …), so build and probe
    * can never disagree on the hash domain. A NULL key hashes to the seed
    * on both sides; the exact semi join afterwards drops it (SQL semantics:
    * NULL matches nothing).
    */
  def bloomPrefilter(table: DataFrame, keyCol: String,
                     keys: DataFrame, keysCol: String,
                     expectedKeys: Long, fpp: Double = 0.01): DataFrame =
    table.where(bloomPredicate(keys, keysCol, expectedKeys, fpp)(col(keyCol)))

  /** The approximate-membership predicate itself: builds the bloom over
    * `keys(keysCol)` (distributed partial sketches, one driver collect of
    * bits ∝ expectedKeys) and returns a reusable might-contain Column for
    * any key expression. `false` is DEFINITIVE (no false negatives) —
    * which is what makes the negated form useful too: rows failing the
    * predicate are certainly absent and can skip an exact join entirely
    * (the incremental-dedup fast path, [[graft.dedup.Dedup]]).
    */
  def bloomPredicate(keys: DataFrame, keysCol: String,
                     expectedKeys: Long, fpp: Double = 0.01): Column => Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    val bloom = keys.select(xxhash64(col(keysCol)).as("__graft_key_hash"))
      .stat.bloomFilter("__graft_key_hash", expectedKeys, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    (key: Column) => org.apache.spark.sql.graft.ColumnShim.column(
      BloomFilterMightContain(
        Literal(bytes, BinaryType),
        org.apache.spark.sql.graft.ColumnShim.expression(xxhash64(key))))
  }

  /** Rows of the scan actually read under a pushed predicate — the
    * "did the index prune" check used by the spec. Counts rows AFTER scan
    * pushdown but BEFORE any join, via a plan metric on the scan node.
    */
  def scannedRows(df: DataFrame): Long = {
    df.collect() // force execution so metrics populate
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case other => other +: other.children.flatMap(unwrap)
    }
    unwrap(df.queryExecution.executedPlan)
      .filter(_.nodeName.toLowerCase.contains("scan"))
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
      .sum
  }
}
