package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("budgetSelect is a prefix cut: overflow ends selection, no skip-and-fill") {
    import spark.implicits._
    // priority order: e(5) d(4) c(3) b(2) a(1); weights 30 30 50 5 5
    // budget 70: e(0+30) fits, d(30+30) fits, c(60+50) overflows —
    // and b (start 110) must NOT be pulled forward even though w=5
    val df = Seq(("a", 1.0, 5L), ("b", 2.0, 5L), ("c", 3.0, 50L),
      ("d", 4.0, 30L), ("e", 5.0, 30L)).toDF("id", "prio", "w")
    val sel = Sampling.budgetSelect(df, col("prio"), col("w"), col("id"), 70L)
      .select("id").collect().map(_.getString(0)).toSet
    assert(sel == Set("e", "d"))
    // budget exactly at a boundary includes the boundary row
    val sel60 = Sampling.budgetSelect(df, col("prio"), col("w"), col("id"), 60L)
      .select("id").collect().map(_.getString(0)).toSet
    assert(sel60 == Set("e", "d"))
    // zero budget selects nothing; huge budget selects everything
    assert(Sampling.budgetSelect(df, col("prio"), col("w"), col("id"), 0L)
      .count() == 0)
    assert(Sampling.budgetSelect(df, col("prio"), col("w"), col("id"), 1000L)
      .count() == 5)
  }

  test("budgetSelect ties break on id; result is partitioning-independent") {
    import spark.implicits._
    val rows = (0 until 500).map(i => (s"id$i", (i % 7).toDouble, 10L))
    val df = rows.toDF("id", "prio", "w")
    def run(d: org.apache.spark.sql.DataFrame): Seq[String] =
      Sampling.budgetSelect(d, col("prio"), col("w"), col("id"), 1234L)
        .select("id").collect().map(_.getString(0)).toSeq.sorted
    val a = run(df.repartition(1))
    val b = run(df.repartition(13, col("id")))
    assert(a == b)
    // 1234/10 = 123 docs fit
    assert(a.length == 123)
  }

  test("waterFill: hand-solved allocations — proportional, saturating, " +
    "oversupplied, exact-budget cases") {
    import spark.implicits._
    def run(rows: Seq[(String, Long, Long)], b: Long): Map[String, (Boolean, Long)] =
      Sampling.waterFill(rows.toDF("src", "supply", "weight"),
          "src", "supply", "weight", b)
        .collect().map(r => r.getString(0) ->
          (r.getBoolean(3), r.getLong(4))).toMap
    // ample supply: pure proportional split, nobody saturates
    val p = run(Seq(("a", 100L, 1L), ("b", 100L, 1L)), 100L)
    assert(p == Map("a" -> (false, 50L), "b" -> (false, 50L)))
    // a runs out at 10; its share redistributes to b
    val s1 = run(Seq(("a", 10L, 1L), ("b", 1000L, 1L)), 100L)
    assert(s1 == Map("a" -> (true, 10L), "b" -> (false, 90L)))
    // budget covers everything: all saturated at supply
    val all = run(Seq(("a", 10L, 3L), ("b", 100L, 1L)), 200L)
    assert(all == Map("a" -> (true, 10L), "b" -> (true, 100L)))
    // mixed case lands exactly on the budget
    val m = run(Seq(("a", 10L, 3L), ("b", 100L, 1L)), 60L)
    assert(m == Map("a" -> (true, 10L), "b" -> (false, 50L)))
    assert(m.values.map(_._2).sum == 60L)
  }

  test("waterFill invariants on a varied fleet: never exceeds budget or " +
    "supply, floors lose less than one unit per unsaturated source") {
    import spark.implicits._
    val rows = (0 until 17).map(i =>
      (s"s$i", (50L + i * 37L) % 400L + 20L, (i % 5L) + 1L))
    val b = 1500L
    val out = Sampling.waterFill(rows.toDF("src", "supply", "weight"),
        "src", "supply", "weight", b)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    out.foreach { case (src, s, _, sat, a) =>
      assert(a <= s, s"$src allocated over supply")
      assert(sat == (a == s) || !sat, s"$src saturation flag inconsistent")
    }
    val total = out.map(_._5).sum
    val nUnsat = out.count(!_._4)
    assert(total <= b, s"total $total exceeds budget")
    assert(total > b - nUnsat, s"floors lost too much: $total vs $b")
  }

  test("curriculumAudit: epoch 0 is exactly the difficulty order (rho 1), " +
    "the final epoch is shuffle-dominated") {
    import spark.implicits._
    val df = (0 until 800).map(i => (i.toLong, (i * 131 % 977).toLong))
      .toDF("doc_id", "n_chars")
    val got = Sampling.curriculumAudit(df, col("n_chars"), col("doc_id"),
        epochs = 4)
      .orderBy("epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(got.forall(_._2 == 800L))
    assert(got(0)._3 == 1.0, s"epoch 0 must serve pure easy→hard: ${got(0)}")
    assert(got(3)._3 < 0.3, s"final epoch must be shuffle-dominated: ${got(3)}")
    assert(got(1)._3 > got(3)._3,
      "difficulty correlation must decay as the shuffle takes over")
  }

  test("hashBits32Of replays the Column hash bit-for-bit") {
    import spark.implicits._
    val keys = Seq("a", "id-17", "Ünïcode", "", "the quick brown fox")
    val engine = keys.toDF("k")
      .select(col("k"), Sampling.hashBits32(col("k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      assert(Sampling.hashBits32Of(k) == engine(k), s"mismatch on '$k'")
    }
  }
}
