package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class KVTextSpec extends SparkSpec {

  test("writeKV then readKV round-trips (first-separator split)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("kvtext").toString + "/out"
    val df = Seq(("k1", "v1"), ("k2", "v with spaces"), ("k3", "v\twith\ttabs"))
      .toDF("key", "value")
    KVText.writeKV(df, dir)
    val back = KVText.readKV(spark, dir)
    val got = back.collect().map(r => (r.getString(0), r.getString(1))).toSet
    // tab-containing value splits at FIRST tab only — rest stays in value
    assert(got == Set("k1" -> "v1", "k2" -> "v with spaces", "k3" -> "v\twith\ttabs"))
  }

  test("readKV: line without separator → (line, empty)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("kvtext2").toString + "/out"
    Seq("noseparator", "a\tb").toDF("value").write.text(dir)
    val got = KVText.readKV(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set("noseparator" -> "", "a" -> "b"))
  }

  test("sampling filters: md5 variants are deterministic and partition-independent") {
    import graft.ops.Sampling
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val n1 = li.where(Sampling.md5Filter(col("l_orderkey"), 16)).count()
    val n2 = li.repartition(13).where(Sampling.md5Filter(col("l_orderkey"), 16)).count()
    assert(n1 == n2)
    // ~1/16 of rows, loose bounds
    val total = li.count()
    assert(n1 > total / 40 && n1 < total / 6)
  }

  test("stratified sample: per-stratum rates, deterministic, partition-independent") {
    import graft.ops.Sampling
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val key = concat_ws("|", col("l_orderkey"), col("l_linenumber"))
    val rates = Map("A" -> 0.25, "N" -> 0.05)
    def counts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.where(Sampling.stratifiedSample(key, col("l_returnflag"), rates))
        .groupBy("l_returnflag").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val c1 = counts(li)
    val c2 = counts(li.repartition(13)) // same keep-set on any layout
    assert(c1 == c2)
    val base = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // per-stratum rates within loose binomial bounds; absent strata keep all
    assert(c1("A") > base("A") / 8 && c1("A") < base("A") / 2)
    assert(c1("N") > base("N") / 100 && c1("N") < base("N") / 10)
    assert(c1("R") == base("R"))
  }

  test("takePerGroup: exactly k per group, deterministic across partitionings") {
    import graft.ops.Sampling
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_returnflag")
    val key = concat_ws("|", col("l_orderkey"), col("l_linenumber"))
    def sample(df: org.apache.spark.sql.DataFrame): Set[(Long, Int)] =
      Sampling.takePerGroup(df, col("l_returnflag"), key, 7)
        .select("l_orderkey", "l_linenumber")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val s1 = sample(li)
    val s2 = sample(li.repartition(13))
    assert(s1 == s2, "per-group sample must not depend on partitioning")
    val counts = Sampling.takePerGroup(li, col("l_returnflag"), key, 7)
      .groupBy("l_returnflag").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 7L), "every group must contribute exactly k")
  }

  test("percentileBand keeps the middle band, trims both tails") {
    import graft.ops.Sampling
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "v")
    val kept = Sampling.percentileBand(df, "v", 0.1, 0.9)
      .select("id").collect().map(_.getLong(0)).toSet
    // exact percentiles of 1..100 at 0.1/0.9 interpolate to 10.9 / 90.1
    assert(kept == (11L to 90L).toSet, s"got ${kept.toSeq.sorted}")
  }

  test("weightedRepeat: integer weights copy exactly, zero drops, gate is partition-independent") {
    import spark.implicits._
    import graft.ops.Sampling
    val df = (1L to 400L).map(i => (i, i % 4)).toDF("id", "grp")
    // integer weights: grp 0 → w=0 (dropped), grp 2 → w=2 (exactly 2 copies)
    val exact = Sampling.weightedRepeat(df,
      col("id"), col("grp").cast("double"))
    val byGrp = exact.groupBy("grp").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!byGrp.contains(0L), "w=0 rows must be dropped")
    assert(byGrp(1L) == 100L && byGrp(2L) == 200L && byGrp(3L) == 300L)
    // copy_id runs 0..w-1 per row
    val ids = exact.where(col("grp") === 3).groupBy("id")
      .agg(sort_array(collect_list("copy_id")).as("c"))
      .select("c").collect().map(_.getSeq[Long](0))
    assert(ids.forall(_ == Seq(0L, 1L, 2L)))
    // fractional gate: deterministic across partitionings, ~w fraction kept
    val frac1 = Sampling.weightedRepeat(df, col("id"), lit(0.5))
      .select("id").collect().map(_.getLong(0)).toSet
    val frac2 = Sampling.weightedRepeat(df.repartition(13), col("id"), lit(0.5))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(frac1 == frac2, "gate must not depend on partitioning")
    assert(frac1.size > 400 / 4 && frac1.size < 400 * 3 / 4)
  }

  test("splitAssign: total, stable under corpus growth, roughly proportional") {
    import spark.implicits._
    import graft.ops.Sampling
    val cuts = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val small = (1L to 2000L).toDF("id")
    val grown = (1L to 4000L).toDF("id")
    def assign(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), Sampling.splitAssign(col("id"), cuts).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = assign(small)
    val b = assign(grown)
    // growth stability: no id migrates between splits when the corpus doubles
    assert(a.forall { case (id, s) => b(id) == s })
    val frac = b.values.groupBy(identity).view.mapValues(_.size / 4000.0)
    assert(math.abs(frac("train") - 0.8) < 0.05
      && math.abs(frac("val") - 0.1) < 0.03
      && math.abs(frac("test") - 0.1) < 0.03, s"fractions $frac")
    // invalid fractions rejected
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(col("id"), Seq("a" -> 0.5, "b" -> 0.2))
    }
  }
}
