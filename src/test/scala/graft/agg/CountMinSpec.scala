package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {

  /** Zipf-ish fixture: key i appears ~N/i times. */
  private def occurrences(n: Int) = {
    import spark.implicits._
    (1 to n).flatMap(i => Seq.fill(n / i)(i.toLong)).toDF("v")
  }

  private def exact(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.groupBy("v").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("sketch estimate never undercounts — the no-false-negative guarantee") {
    val occ = occurrences(60)
    val truth = exact(occ)
    val sk = CountMin.sketchArrays(occ, col("v"), depth = 4, width = 64)
    val est = occ.select(col("v")).distinct()
      .select(col("v"), CountMin.estimate(col("v"), sk, 64).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, c) =>
      assert(est(k) >= c, s"estimate ${est(k)} < true $c for key $k")
    }
    // the sparse form is the mergeable one: cells of a split input sum
    // to the cells of the whole
    val whole = CountMin.sketch(occ, col("v"), 3, 32)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (a, b) = (occ.filter(col("v") % 2 === 0), occ.filter(col("v") % 2 =!= 0))
    val merged = (CountMin.sketch(a, col("v"), 3, 32).collect() ++
        CountMin.sketch(b, col("v"), 3, 32).collect())
      .groupBy(r => (r.getInt(0), r.getLong(1)))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).sum }
    assert(merged == whole)
  }

  test("heavyHitters is exact: identical to GROUP BY HAVING at any width") {
    val occ = occurrences(80)
    val truth = exact(occ).filter(_._2 >= 10)
    // roomy width: gate is tight
    val roomy = CountMin.heavyHitters(occ, col("v"), 10, depth = 4, width = 512)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(roomy == truth)
    // starved width (8 cells, 80 keys): collisions flood the gate with
    // false positives, but the exact count still discards every one
    val starved = CountMin.heavyHitters(occ, col("v"), 10, depth = 2, width = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starved == truth)
  }

  test("the gate actually prunes: survivors well below distinct keys") {
    val occ = occurrences(200) // key 1: 200 occurrences ... key 200: 1
    val sk = CountMin.sketchArrays(occ, col("v"), depth = 4, width = 1024)
    val gated = occ.select(col("v"))
      .filter(CountMin.estimate(col("v"), sk, 1024) >= 50)
      .select("v").distinct().count()
    val truthCount = exact(occ).count(_._2 >= 50)
    assert(gated >= truthCount, "gate must keep every true hitter")
    assert(gated < 20, s"gate should prune ~196 of 200 keys, kept $gated")
  }

  test("autoWidth: subcritical vs N/T, capped by distinct count, clamped") {
    // small-everything regime: 80 keys, ~400 occurrences, T=10 —
    // 8N/T ≈ 320 and 16D = 1280, both at or under the floor → floor
    assert(CountMin.autoWidth(occurrences(80), col("v"), 10)
      == CountMin.MinAutoWidth)
    // huge threshold shrinks 8N/T to ~3 → floor wins
    assert(CountMin.autoWidth(occurrences(80), col("v"), 1000)
      == CountMin.MinAutoWidth)
    // growth regime: 3000 keys, ~24k occurrences, T=4 — 8N/T ≈ 48.6k
    // and 16D̂ ≈ 48k ± HLL rsd; either way the min lands in
    // (32768, 65536] so the power-of-two round-up is exactly 65536
    val w = CountMin.autoWidth(occurrences(3000), col("v"), 4)
    assert(w == 65536, s"expected 65536, got $w")
    assert(w >= CountMin.MinAutoWidth && w <= CountMin.MaxAutoWidth)
  }

  test("heavyHittersAuto matches GROUP BY HAVING with no width knob") {
    val occ = occurrences(120)
    val truth = exact(occ).filter(_._2 >= 12)
    val auto = CountMin.heavyHittersAuto(occ, col("v"), 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(auto == truth)
  }

  test("deterministic and partitioning-independent") {
    val occ = occurrences(50)
    def run(parts: Int) =
      CountMin.heavyHitters(occ.repartition(parts), col("v"), 5,
        depth = 3, width = 128).collect().map(_.toSeq).toSet
    assert(run(1) == run(17) && run(1).nonEmpty)
  }
}
