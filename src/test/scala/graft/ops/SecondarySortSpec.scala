package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SecondarySortSpec extends SparkSpec {

  test("clusterSort makes groups contiguous and internally ordered") {
    import spark.implicits._
    val df = Seq((2, 30), (1, 20), (2, 10), (1, 10), (2, 20))
      .toDF("k", "o")
    val sorted = SecondarySort.clusterSort(df, Seq(col("k")), Seq(col("o").asc))
    val perPartition = sorted.rdd.mapPartitions { it =>
      Iterator(it.map(r => (r.getInt(0), r.getInt(1))).toSeq)
    }.collect()
    perPartition.foreach { part =>
      // within a partition: keys contiguous, order values ascending per key
      val keys = part.map(_._1)
      assert(keys == keys.sorted || keys.distinct.size == keys.size ||
        keys.zip(keys.tail).forall { case (a, b) => a <= b || !keys.drop(keys.indexOf(b)).contains(a) })
      part.groupBy(_._1).values.foreach { g =>
        val os = g.map(_._2)
        assert(os == os.sorted)
      }
    }
  }

  test("foldGroupsSorted streams one pass per group in sort order") {
    import spark.implicits._
    val df = Seq((1, 3, "c"), (1, 1, "a"), (1, 2, "b"), (2, 9, "z"), (2, 8, "y"))
      .toDF("k", "o", "v")
    val out = SecondarySort.foldGroupsSorted[StringBuilder](
      df, Seq(col("k")), Seq(col("o").asc))(
      _ => new StringBuilder)(
      (sb, r) => sb.append(r.getAs[String]("v")))(
      (first, sb) => Row(first.getAs[Int]("k"), sb.toString),
      StructType(Seq(StructField("k", IntegerType), StructField("concat", StringType))))
    val got = out.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == Map(1 -> "abc", 2 -> "yz"))
  }

  test("foldGroupsSorted matches SQL secondary sort on real data") {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
    val out = SecondarySort.foldGroupsSorted[List[Int]](
      li, Seq(col("l_orderkey")), Seq(col("l_shipdate").asc, col("l_linenumber").asc))(
      _ => Nil)(
      (acc, r) => r.getAs[Int]("l_linenumber") :: acc)(
      (first, acc) => Row(first.getAs[Long]("l_orderkey"), acc.reverse.mkString(",")),
      StructType(Seq(StructField("k", LongType), StructField("lns", StringType))))
    val expected = li.groupBy("l_orderkey").agg(
      array_join(transform(array_sort(collect_list(struct(
        col("l_shipdate"), col("l_linenumber")))),
        x => x.getField("l_linenumber").cast("string")), ",").as("lns"))
    val a = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val e = expected.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == e)
  }
}
