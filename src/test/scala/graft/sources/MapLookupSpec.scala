package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MapFile-style lookup: correctness of each access path AND the pruning
  * contract — a keyed point lookup must not read the whole table (the
  * MapFile index-seek property, here via bucket pruning on the IN
  * predicate over the bucket column).
  */
class MapLookupSpec extends SparkSpec {

  private lazy val orders = {
    Bucketed.writeBucketed(
      graft.Tables.load(spark, sfDir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      "spec_maplookup_orders", "o_orderkey", 8)
    Bucketed.table(spark, "spec_maplookup_orders")
  }
  private lazy val raw = graft.Tables.load(spark, sfDir, "orders")

  test("lookupKeys returns exactly the requested keys' rows") {
    val keys = raw.select("o_orderkey").limit(3)
      .collect().map(_.getLong(0)).toSeq
    val got = MapLookup.lookupKeys(orders, "o_orderkey", keys)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(got == keys.toSet)
  }

  test("lookupKeys prunes: scan reads a strict subset of the table (bucket pruning)") {
    val total = raw.count()
    val keys = raw.select("o_orderkey").limit(2)
      .collect().map(_.getLong(0)).toSeq
    val scanned = MapLookup.scannedRows(
      MapLookup.lookupKeys(orders, "o_orderkey", keys))
    // 2 keys hit <=2 of 8 buckets; anything >= half the table means the
    // pushed predicate did not prune the layout
    assert(scanned < total / 2,
      s"scan read $scanned of $total rows — bucket pruning did not engage")
  }

  test("lookupSemi matches a plain semi join and never multiplies on dup keys") {
    val keys = raw.where(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("k"))
    val dupKeys = keys.union(keys) // duplicated request list
    val got = MapLookup.lookupSemi(orders, "o_orderkey", dupKeys, "k")
    val expect = raw.join(keys, col("o_orderkey") === col("k"), "left_semi")
    assert(got.count() == expect.count())
    assert(got.select("o_orderkey").collect().map(_.getLong(0)).toSet ==
      expect.select("o_orderkey").collect().map(_.getLong(0)).toSet)
  }

  test("lookupSemi plans zero shuffle exchanges (broadcast probe only)") {
    val keys = raw.where(col("o_orderkey") % 11 === 0)
      .select(col("o_orderkey").as("k"))
    val n = Bucketed.shuffleCount(
      MapLookup.lookupSemi(orders, "o_orderkey", keys, "k"))
    assert(n == 0, s"lookup should not shuffle the fact side, saw $n exchanges")
  }

  test("bloomPrefilter: no false negatives, real pruning at selective keys") {
    val keys = raw.where(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").as("k"))
    val nKeys = keys.count()
    val exact = raw.join(keys, col("o_orderkey") === col("k"), "left_semi")
    val pre = MapLookup.bloomPrefilter(raw, "o_orderkey", keys, "k",
      expectedKeys = math.max(nKeys, 1), fpp = 0.01)
    // every true match survives the approximate filter
    assert(exact.join(pre, Seq("o_orderkey"), "left_anti").count() == 0)
    // and the filter actually cut the table down near the hit rate
    val total = raw.count()
    assert(pre.count() < total / 2,
      s"bloom kept ${pre.count()} of $total rows — no pruning")
  }

  test("bloomPrefilter: string keys — no false negatives (dtype-general hash domain)") {
    val t = raw.select(concat(lit("k"), col("o_orderkey")).as("okey"),
      col("o_totalprice"))
    val keys = raw.where(col("o_orderkey") % 97 === 0)
      .select(concat(lit("k"), col("o_orderkey")).as("k"))
    val exact = t.join(keys, col("okey") === col("k"), "left_semi")
    val pre = MapLookup.bloomPrefilter(t, "okey", keys, "k",
      expectedKeys = math.max(keys.count(), 1), fpp = 0.01)
    assert(exact.join(pre, Seq("okey"), "left_anti").count() == 0,
      "a true string-key match was dropped by the approximate filter")
    assert(pre.count() < t.count() / 2,
      s"bloom kept ${pre.count()} of ${t.count()} rows — no pruning on string keys")
  }

  test("bloomPrefilter plans the native might_contain predicate, not a Scala UDF") {
    val keys = raw.where(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").as("k"))
    val plan = MapLookup.bloomPrefilter(raw, "o_orderkey", keys, "k",
      expectedKeys = 100).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected BloomFilterMightContain in the plan:\n${plan.take(800)}")
    assert(!plan.contains("UDF"),
      "bloom pre-filter must stay codegen'd — no Scala UDF in the plan")
  }
}
