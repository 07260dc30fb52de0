package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted aggregation equals direct groupBy for any salt count") {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val direct = li.groupBy(col("l_returnflag").as("key"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast("long")).as("qty"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (salt <- Seq(1, 4, 33)) {
      val salted = Skew.saltedAggregate(li, col("l_returnflag"), salt, Seq(
        ("cnt", count(lit(1)), sum(col("cnt"))),
        ("qty", sum(col("l_quantity").cast("long")), sum(col("qty")))))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(salted == direct, s"salt=$salt")
    }
  }

  test("split points are monotone and partition data evenly-ish") {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val pts = Skew.splitPoints(li, "l_extendedprice", 8)
    assert(pts.length == 7)
    assert(pts.toSeq == pts.sorted.toSeq)
    // each of the 8 ranges should hold roughly 1/8 of rows (loose bounds)
    val total = li.count()
    val firstBucket = li.where(col("l_extendedprice") <= pts.head).count()
    assert(firstBucket > total / 16 && firstBucket < total / 4)
  }

  test("salted join equals plain inner join, multiplicity preserved") {
    import spark.implicits._
    // planted hot key 7 (many probe rows) + duplicate small-side rows
    // (multiplicity must survive salting: 2 dim rows for key 7 → each
    // probe row matches twice, salted or not)
    val big = (Seq.fill(500)(7L) ++ (1L to 100L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val small = Seq((7L, "hot-a"), (7L, "hot-b"), (1L, "one"), (2L, "two"))
      .toDF("k", "name")
    val plain = big.join(small, "k").select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    for (salt <- Seq(1, 8)) {
      val salted = Skew.saltedJoin(big, small, "k", salt)
        .select("k", "v", "name")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sorted.toSeq
      assert(salted == plain, s"salt=$salt")
    }
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    // the session's skewJoin config (on by default in GraftSession) is the
    // OTHER half of the skew story next to saltedAggregate: joins need no
    // manual salting because AQE re-plans the hot partition. Force the
    // shuffle path (no broadcast) and thresholds small enough that the
    // planted hot key (99% of rows on k=0) trips the splitter, then
    // assert the executed adaptive plan actually marked the join skewed.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val facts = spark.range(300000).select(
        when(col("id") % 100 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val dim = spark.range(3000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = facts.join(dim, "k")
      // drive THIS DataFrame's own QueryExecution: a write plans a fresh
      // one, and even Dataset.foreach/rdd use a separate
      // rddQueryExecution — only toRdd executes the AdaptiveSparkPlan we
      // inspect below
      assert(joined.queryExecution.toRdd.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in the adaptive plan, got:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
