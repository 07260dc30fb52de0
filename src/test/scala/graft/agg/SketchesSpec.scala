package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("fewer than k distinct values -> estimate is the exact count") {
    import spark.implicits._
    val df = (1 to 500).map(i => i % 7).toDF("v") // 7 distinct
    val r = Sketches.kmvDistinct(df, col("v"), 128).head()
    assert(r.getDouble(0) == 7.0)
    assert(r.getLong(1) == 128L)
  }

  test("estimate lands within the expected error band (1/sqrt(k-2))") {
    import spark.implicits._
    val n = 20000
    val df = (1 to n).map(i => s"key_$i").toDF("v")
    val est = Sketches.kmvDistinct(df, col("v"), 256).head().getDouble(0)
    // std err ~ 1/sqrt(254) ~ 6.3%; 4 sigma gives a deterministic-input
    // assertion that only a hash-quality bug would trip
    assert(math.abs(est - n) / n < 0.25, s"estimate $est vs exact $n")
  }

  test("sketch of a union == trimmed union of the sketches (mergeable)") {
    import spark.implicits._
    val a = (1 to 3000).map(i => s"a_$i").toDF("v")
    val b = (1 to 3000).map(i => s"b_$i").toDF("v")
    val k = 64
    val whole = Sketches.kmvSketch(a.union(b), col("v"), k)
      .collect().map(_.getDouble(0)).toSeq
    val merged = Sketches.kmvSketch(a, col("v"), k)
      .union(Sketches.kmvSketch(b, col("v"), k))
      .distinct().orderBy(col("h")).limit(k)
      .collect().map(_.getDouble(0)).toSeq
    assert(whole == merged)
  }

  test("per-group estimates equal each group's independent global sketch") {
    import spark.implicits._
    val df = ((1 to 4000).map(i => ("big", s"k_$i"))
      ++ (1 to 30).map(i => ("small", s"s_$i"))
      ++ (1 to 4000).map(i => ("big", s"k_$i"))).toDF("g", "v") // dups too
    val by = Sketches.kmvDistinctByGroup(df, col("g"), col("v"), 64)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    for (g <- Seq("big", "small")) {
      val solo = Sketches.kmvDistinct(df.where(col("g") === g), col("v"), 64)
        .head()
      assert(by(g) == (solo.getDouble(0), solo.getLong(1)), s"group $g")
    }
    // the small group is under k -> exact
    assert(by("small")._1 == 30.0)
  }

  test("estimate is partitioning-independent (deterministic hash, not RNG)") {
    import spark.implicits._
    val df = (1 to 5000).map(i => s"key_$i").toDF("v")
    val e1 = Sketches.kmvDistinct(df.repartition(1), col("v"), 128).head().getDouble(0)
    val e32 = Sketches.kmvDistinct(df.repartition(32), col("v"), 128).head().getDouble(0)
    assert(e1 == e32)
  }
}
