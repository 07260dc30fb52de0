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

  test("HLL estimate lands within the expected error band (1.04/sqrt(m))") {
    import spark.implicits._
    val n = 20000
    val df = (1 to n).map(i => ("g", s"key_$i")).toDF("g", "v")
    val r = Sketches.hllDistinctByGroup(df, col("g"), col("v"), m = 64).head()
    val est = r.getDouble(1)
    // std err ~ 1.04/8 = 13%; 4 sigma, deterministic inputs
    assert(math.abs(est - n) / n < 0.52, s"estimate $est vs exact $n")
    assert(r.getLong(2) == 0L, "20k keys should touch all 64 registers")
    assert(r.getLong(3) == 64L)
  }

  test("HLL is partitioning-independent and registers only grow under union") {
    import spark.implicits._
    val a = (1 to 3000).map(i => ("g", s"a_$i")).toDF("g", "v")
    val b = (1 to 3000).map(i => ("g", s"b_$i")).toDF("g", "v")
    def est(df: org.apache.spark.sql.DataFrame, parts: Int) =
      Sketches.hllDistinctByGroup(df.repartition(parts), col("g"), col("v"))
        .head().getDouble(1)
    assert(est(a, 1) == est(a, 17))
    // union can only raise register maxima -> estimate never shrinks
    val u = est(a.union(b), 4)
    assert(u >= est(a, 4) && u >= est(b, 4))
  }

  test("HLL per-group estimates equal each group's independent run") {
    import spark.implicits._
    val df = ((1 to 2000).map(i => ("big", s"k_$i"))
      ++ (1 to 40).map(i => ("small", s"s_$i"))).toDF("g", "v")
    val by = Sketches.hllDistinctByGroup(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (g <- Seq("big", "small")) {
      val solo = Sketches
        .hllDistinctByGroup(df.where(col("g") === g), col("g"), col("v"))
        .head().getDouble(1)
      assert(by(g) == solo, s"group $g")
    }
    // a small group leaves most of the 64 registers empty
    val smallZeros = Sketches.hllDistinctByGroup(
      df.where(col("g") === "small"), col("g"), col("v"))
      .head().getLong(2)
    assert(smallZeros > 0 && smallZeros < 64)
  }

  test("HLL rejects unsupported register counts") {
    import spark.implicits._
    val df = Seq(("g", "x")).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Sketches.hllDistinctByGroup(df, col("g"), col("v"), m = 100)
    }
  }

  test("KMV intersection: exact mode, identical, disjoint, overlap band") {
    import spark.implicits._
    // exact mode: union fits in k, sketch IS the sets
    val sa = Seq("x", "y", "z").toDF("k")
    val sb = Seq("y", "z", "w").toDF("k")
    val ex = Sketches.kmvIntersect(sa, col("k"), sb, col("k"), 64).head()
    assert(ex.getLong(0) == 4 && ex.getLong(1) == 2
      && ex.getDouble(3) == 2.0)
    // identical sets: every union-sketch hash is in both sides
    val a = (1 to 500).map(i => s"k$i").toDF("k")
    val same = Sketches.kmvIntersect(a, col("k"), a, col("k"), 64).head()
    assert(same.getDouble(3) == same.getDouble(2))
    // disjoint sets: zero matched, zero estimate
    val c = (10000 to 10500).map(i => s"z$i").toDF("k")
    val dis = Sketches.kmvIntersect(a, col("k"), c, col("k"), 64).head()
    assert(dis.getLong(1) == 0L && dis.getDouble(3) == 0.0)
    // 200-key overlap of 500-key sets: estimate lands in a sane band
    val b = (301 to 800).map(i => s"k$i").toDF("k")
    val est = Sketches.kmvIntersect(a, col("k"), b, col("k"), 64)
      .head().getDouble(3)
    assert(est > 60 && est < 420, s"est_intersect=$est for true 200")
  }

  test("sliding HLL == from-scratch HLL over each trailing window") {
    import spark.implicits._
    // days 0..9, keys overlap across days so merge ≠ sum
    val rows = for (d <- 0L until 10L; k <- 0 until 40)
      yield (d, s"user${(d * 7 + k) % 120}")
    val df = rows.toDF("day", "key")
    val slid = Sketches.hllSlidingDistinct(df, col("day"), col("key"),
        windowDays = 3)
      .select("day", "hll_est", "zero_registers")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    val direct = (0L until 10L).map { wend =>
      val win = df.where(col("day") >= wend - 2 && col("day") <= wend)
      val r = Sketches.hllDistinctByGroup(win, lit(wend), col("key")).head()
      (wend, r.getDouble(1), r.getLong(2))
    }
    assert(slid == direct)
  }

  test("hash-sample quantiles: k >= group size degenerates to exact quantiles") {
    import spark.implicits._
    val rows = for (g <- Seq("a", "b"); i <- 0 until 50)
      yield (g, (i * 13 + g.hashCode.abs) % 97, s"$g-$i")
    val df = rows.toDF("grp", "v", "id")
    val ps = Seq(0.1, 0.5, 0.9)
    val approx = Sketches.hashSampleQuantiles(df, ps, "grp", "v", "id", k = 50)
      .orderBy("grp", "p").collect().toSeq
    val exact = graft.ops.GlobalRank.interpolatedQuantiles(df, ps, "grp", "v", "id")
      .orderBy("grp", "p").collect().toSeq
    assert(approx == exact)
  }

  test("hash-sample quantiles: rank error stays inside the O(1/sqrt(k)) band") {
    import spark.implicits._
    // Planted uniform 0..9999: the true p-quantile is ~10000p, so the
    // observed rank error |approx/10000 - p| reads off directly.
    val rnd = new scala.util.Random(42)
    val rows = rnd.shuffle((0 until 10000).toList).map(v => (v, s"id$v"))
    val df = rows.toDF("v", "id").withColumn("grp", lit("all"))
    val k = 256
    val got = Sketches.hashSampleQuantiles(
        df, Seq(0.1, 0.5, 0.9), "grp", "v", "id", k)
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toMap
    // 3 standard errors of the bottom-k binomial: 3*sqrt(p(1-p)/k)
    for ((p, q) <- got) {
      val tol = 3 * math.sqrt(p * (1 - p) / k)
      assert(math.abs(q / 10000.0 - p) <= tol,
        s"p=$p q=$q err=${math.abs(q / 10000.0 - p)} tol=$tol")
    }
  }

  test("hash-sample quantiles hold the rank-error band on a SKEWED " +
    "(Zipf-ish) distribution, not just uniform") {
    import spark.implicits._
    // heavy head: value v appears ~N/v times (harmonic mass) — the
    // sketch's bottom-k samples ROWS, so rank error is still binomial
    // in k regardless of the value distribution
    val rows = (1 to 200).flatMap(v => Seq.fill(2000 / v)((v, s"$v"))).zipWithIndex
      .map { case ((v, _), i) => (v, s"id$i") }
    val df = rows.toDF("v", "id").withColumn("grp", lit("all"))
    val n = rows.length
    val exact = graft.ops.GlobalRank.interpolatedQuantiles(
        df, Seq(0.5, 0.9), "grp", "v", "id")
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val approx = Sketches.hashSampleQuantiles(
        df, Seq(0.5, 0.9), "grp", "v", "id", k = 256)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // translate the 3σ RANK tolerance into value space via the exact
    // quantiles at p ± tol — the right error model for skewed data
    for (p <- Seq(0.5, 0.9)) {
      val tol = 3 * math.sqrt(p * (1 - p) / 256)
      val lo = graft.ops.GlobalRank.interpolatedQuantiles(
        df, Seq(math.max(0, p - tol)), "grp", "v", "id").head().getDouble(2)
      val hi = graft.ops.GlobalRank.interpolatedQuantiles(
        df, Seq(math.min(1, p + tol)), "grp", "v", "id").head().getDouble(2)
      assert(approx(p) >= lo && approx(p) <= hi,
        s"p=$p approx=${approx(p)} outside [$lo,$hi] (exact=${exact(p)}, n=$n)")
    }
  }

  test("hash-sample quantiles are partitioning-independent (pure hash sample)") {
    import spark.implicits._
    val rows = (0 until 3000).map(i => ("g" + (i % 3), i * 7 % 1000, s"id$i"))
    val df = rows.toDF("grp", "v", "id")
    val ps = Seq(0.25, 0.75)
    val a = Sketches.hashSampleQuantiles(df.repartition(1), ps, "grp", "v", "id", 64)
      .orderBy("grp", "p").collect().toSeq
    val b = Sketches.hashSampleQuantiles(
        df.repartition(17, col("id")), ps, "grp", "v", "id", 64)
      .orderBy("grp", "p").collect().toSeq
    assert(a == b)
  }

  test("hash-sample is mergeable: sketch of a union == trimmed union of sketches") {
    import spark.implicits._
    // The retained SAMPLE (bottom-k ids by hash) must satisfy the KMV
    // merge law; quantiles over equal samples are then equal for free.
    val part1 = (0 until 400).map(i => ("g", i, s"id$i")).toDF("grp", "v", "id")
    val part2 = (400 until 900).map(i => ("g", i, s"id$i")).toDF("grp", "v", "id")
    val k = 32
    def sampleIds(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
        .orderBy(graft.ops.Sampling.hashBits32(col("id")), col("id"))
      df.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
        .select("id").collect().map(_.getString(0)).toSeq.sorted
    }
    val whole = sampleIds(part1.unionByName(part2))
    val merged = {
      val u = (sampleIds(part1) ++ sampleIds(part2)).distinct
      val byHash = u.map(id => (graft.ops.Sampling.hashBits32Of(id), id)).sorted
      byHash.take(k).map(_._2).sorted
    }
    assert(whole == merged)
  }
}
