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
  * combinable aggregation whose output is at most d×w cells regardless
  * of input size; that CONSTANT-size summary is collected and
  * re-embedded as array LITERALS (one constant object per depth — the
  * same treatment as the IVF centroid arrays and the GlobalRank offset
  * table; a per-row broadcast join would copy the d×w payload into
  * every joined row). The gate is then a codegen'd O(depth) Column in
  * the scan stage, and the exact count shuffles ONLY gated survivors.
  * A plain `GROUP BY token HAVING count >= T` shuffles every distinct
  * token; this shuffles ~|hitters| plus the eps = e/width
  * false-positive tail.
  *
  * Sizing discipline: cells average `total_occurrences / width`, so an
  * ABSOLUTE threshold needs `width ∝ N/threshold` or the gate saturates
  * (every cell clears T and nothing is pruned — still exact, just no
  * benefit); a FRACTIONAL threshold `T = φN` needs only `width > 1/φ`,
  * which is scale-free. The bench's d7/d7w trend measures exactly this
  * knee. Everything is deterministic (md5 row hashes), so any engine
  * replays the same sketch.
  */
object CountMin {

  /** Depth-`i` cell for a key: first 15 md5 hex digits of `i|key`,
    * mod `width`. 60 bits → exact in a long; deterministic cross-engine.
    */
  def cell(i: Int, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat_ws("|", lit(i), key.cast("string"))), 1, 15),
      16, 10).cast("long"), lit(width.toLong))

  /** The merged sketch in its distributed, mergeable form: sparse
    * `(d, c, cnt)` cells, at most depth×width rows however large the
    * input (two sketches over disjoint inputs merge by summing cnt per
    * cell — the map-side-combine property).
    */
  def sketch(occurrences: DataFrame, key: Column,
             depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape: $depth x $width")
    occurrences
      .select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("d"), cell(i, key, width).as("c"))): _*)).as("dc"))
      .groupBy(col("dc.d").as("d"), col("dc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The sketch densified on the driver: `result(i)(c)` = count of cell
    * `c` at depth `i`. The collect moves at most depth×width rows — a
    * size fixed by the sketch SHAPE, not the data (the constant-summary
    * contract that makes a sketch a sketch).
    */
  def sketchArrays(occurrences: DataFrame, key: Column,
                   depth: Int, width: Int): Array[Array[Long]] = {
    val dense = Array.fill(depth)(new Array[Long](width))
    sketch(occurrences, key, depth, width).collect().foreach { r =>
      dense(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2)
    }
    dense
  }

  /** Sketch estimate for `key`: min over depths of the key's cell
    * counts, against driver-densified arrays embedded as literals.
    * Always >= the true count; O(depth) per row, stays in codegen.
    */
  def estimate(key: Column, sk: Array[Array[Long]], width: Int): Column =
    least(sk.indices.map(i =>
      element_at(typedlit(sk(i).toSeq), (cell(i, key, width) + 1).cast("int"))): _*)

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
    val sk = sketchArrays(occurrences, key, depth, width)
    occurrences
      .select(key.as("k"))
      .filter(estimate(col("k"), sk, width) >= threshold)
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }
}
