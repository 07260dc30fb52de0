package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  test("profile counts nulls, distincts, and min/max per column in one pass") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("b")), (Some(2L), None), (None, Some("a")),
      (Some(2L), Some("a")), (None, None)
    ).toDF("x", "y")
    val got = Profile.profile(df, Seq("x", "y")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(got("x") == ((3L, 2L, 2L, "1", "2")))
    assert(got("y") == ((3L, 2L, 2L, "a", "b")))
  }

  test("equi-depth histogram: near-equal counts, contiguous coverage, tie safety") {
    import spark.implicits._
    // 97 rows (not divisible by 4) + a heavy tie run straddling a boundary
    val vals = (1 to 80).map(_.toDouble) ++ Seq.fill(17)(40.5)
    val hist = Profile.equiDepthHistogram(vals.toDF("x"), "x", 4)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(hist.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    // depths differ by at most one: 97/4 = 24 or 25
    assert(hist.map(_._4).forall(c => c == 24 || c == 25))
    assert(hist.map(_._4).sum == 97)
    // buckets tile the sorted domain: each lo <= hi, next lo >= prev hi
    hist.foreach { case (_, lo, hi, _) => assert(lo <= hi) }
    hist.sliding(2).foreach { case Array(a, b) => assert(b._2 >= a._3) }
    // determinism under different partitioning (tie order may differ)
    val h2 = Profile.equiDepthHistogram(
      vals.toDF("x").repartition(13), "x", 4)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(h2.toSeq == hist.toSeq)
  }

  test("single aggregation pass: one shuffle regardless of column count") {
    val cust = graft.Tables.load(spark, sfDir, "customer")
    val plan = Profile.profile(cust,
      Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
      .queryExecution.executedPlan.toString
    // multi-distinct plans as expand + two-level agg: exchanges stay
    // bounded (partial/final agg pair + the final single-partition
    // gather of one row), never one job per column
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"profile must read the table once, saw $scans scans:\n$plan")
  }

  test("psiDrift: identical snapshots read 0; a hand-computed shift matches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val oldD = (Seq.fill(80)(10L) ++ Seq.fill(20)(30L)).toDF("v")
    val self = Profile.psiDrift(oldD, oldD, col("v"), Seq(20L, 40L)).head()
    assert(self.getDouble(0) == 0.0 && self.getLong(1) == 2L)
    // new: 50/50 over the same bins — PSI = (.8-.5)ln(.8/.5)+(.2-.5)ln(.2/.5)
    val newD = (Seq.fill(50)(10L) ++ Seq.fill(50)(30L)).toDF("v")
    val got = Profile.psiDrift(oldD, newD, col("v"), Seq(20L, 40L))
      .head().getDouble(0)
    // replay the operator's exact quantization ladder
    val t1 = math.rint((0.8 - 0.5) * (math.rint(math.log(0.8 / 0.5) * 1e9) / 1e9) * 1e9)
    val t2 = math.rint((0.2 - 0.5) * (math.rint(math.log(0.2 / 0.5) * 1e9) / 1e9) * 1e9)
    val expect = math.rint((t1 + t2) / 1e9 * 1e6) / 1e6
    assert(got == expect, s"got $got expect $expect")
    assert(got > 0.25, "a 30-point mass shift must read as population shift")
  }
}
