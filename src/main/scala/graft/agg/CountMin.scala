package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a heavy-hitter
  * GATE — the sketch-prunes-then-exact-verifies discipline this engine
  * uses everywhere (LSH → Jaccard, cells → cosine): the sketch never
  * undercounts, so filtering occurrences by `estimate >= threshold`
  * BEFORE the exact aggregation loses no true heavy hitter, and the
  * exact count afterwards discards the sketch's false positives. The
  * output is therefore EXACT — the sketch only decides how much reaches
  * the shuffle.
  *
  * Reference lineage: the aggregate framework's `UniqValueCount`/
  * `ValueHistogram` capped per-key state to survive skew
  * (`/root/reference/src/mapred/org/apache/hadoop/mapred/lib/aggregate/ValueHistogram.java:30`);
  * count-min is the principled version — fixed d×w state for ANY key
  * cardinality.
  *
  * Scale shape (100 TB wordcount): the sketch build is one map-side-
  * combinable aggregation whose output is d×w cells regardless of input
  * size; the sketch rides back as a 1-row broadcast scalar (never
  * collected to the driver); the gate is a pure Column expression in the
  * scan stage; the exact count shuffles ONLY gated survivors — true
  * heavy hitters plus a false-positive tail bounded by the classic
  * eps = e/width overestimate bound. A plain `GROUP BY token HAVING
  * count >= T` shuffles every distinct token; this shuffles ~|hitters|.
  * Everything is deterministic (md5 row hashes), so any engine replays
  * the same sketch.
  */
object CountMin {

  /** Depth-`i` cell for a key: first 15 md5 hex digits of `i|key`,
    * mod `width`. 60 bits → exact in a long; deterministic cross-engine.
    */
  def cell(i: Int, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat_ws("|", lit(i), key.cast("string"))), 1, 15),
      16, 10).cast("long"), lit(width.toLong))

  /** The merged sketch as ONE ROW holding a depth→dense-counts map —
    * shaped for `crossJoin(broadcast(...))` so estimates stay codegen'd
    * Column lookups with a plan size independent of `width`.
    */
  def sketch(occurrences: DataFrame, key: Column,
             depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape: $depth x $width")
    val cells = occurrences
      .select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("d"), cell(i, key, width).as("c"))): _*)).as("dc"))
      .groupBy(col("dc.d").as("d"), col("dc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
    cells
      .groupBy("d")
      .agg(map_from_entries(collect_list(struct(col("c"), col("cnt")))).as("m"))
      .select(col("d"),
        transform(sequence(lit(0L), lit(width - 1L)),
          j => coalesce(element_at(col("m"), j), lit(0L))).as("arr"))
      .groupBy()
      .agg(map_from_entries(collect_list(struct(col("d"), col("arr")))).as("_cm"))
  }

  /** Sketch estimate for `key` against a joined `_cm` column: min over
    * depths of the key's cell counts. Always >= the true count.
    */
  def estimate(key: Column, depth: Int, width: Int): Column =
    least((0 until depth).map(i =>
      element_at(element_at(col("_cm"), i), (cell(i, key, width) + 1).cast("int"))): _*)

  /** EXACT keys with occurrence count >= `threshold`, computed through
    * the sketch gate: occurrences whose estimate clears the threshold
    * are exactly counted; the rest never leave the scan stage.
    *
    * @return (key as `k`, `cnt`) — identical to
    *         `GROUP BY key HAVING count(*) >= threshold`.
    */
  def heavyHitters(occurrences: DataFrame, key: Column, threshold: Long,
                   depth: Int = 4, width: Int = 8192): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val sk = sketch(occurrences, key, depth, width)
    occurrences
      .select(key.as("k"))
      .crossJoin(broadcast(sk))
      .filter(estimate(col("k"), depth, width) >= threshold)
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }
}
