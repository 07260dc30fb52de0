package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("zValue interleaves bits exactly") {
    import spark.implicits._
    // x=3 (0011), y=5 (0101): positions x0->0, y0->1, x1->2, y2->5
    // => 1 + 2 + 4 + 32 = 39
    val got = Seq((3L, 5L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 4)).head().getLong(0)
    assert(got == 39L)
    // driver replay over a grid
    val grid = for (x <- 0L to 15L; y <- 0L to 15L) yield (x, y)
    val expect = grid.map { case (x, y) =>
      (0 until 4).map(i =>
        ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)).sum
    }
    val zs = grid.toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 4)).collect().map(_.getLong(0))
    assert(zs.toSeq == expect)
  }

  test("clusterByZ changes layout, never content") {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val z = ZOrder.clusterByZ(li, "l_partkey", "l_suppkey", bits = 8, n = 8)
    assert(z.schema == li.schema)
    assert(z.collect().map(_.toSeq).toSet == li.collect().map(_.toSeq).toSet)
  }

  /** Files whose (x, y) bounding box intersects the box query — what
    * parquet min/max pruning would scan under each layout.
    */
  private def filesTouched(dir: String, xMax: Long, yMax: Long): (Int, Int) = {
    val boxes = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_partkey").as("x0"), max("l_partkey").as("x1"),
        min("l_suppkey").as("y0"), max("l_suppkey").as("y1"))
      .collect()
    val touched = boxes.count(r =>
      r.getLong(1) <= xMax && r.getLong(3) <= yMax)
    (touched, boxes.length)
  }

  test("z-layout prunes a 2-D box where an uncorrelated layout scans everything") {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val root = "/tmp/graft_test/zorder"
    def write(df: DataFrame, name: String): String = {
      val p = s"$root/$name"
      df.write.mode("overwrite").parquet(p)
      p
    }
    // z-clustered vs clustered by an UNCORRELATED key (orderkey): the
    // box is the low quadrant of both dimensions
    val (xMax, yMax) = (50L, 3L)
    val zDir = write(ZOrder.clusterByZ(li, "l_partkey", "l_suppkey", 8, 16), "z")
    val oDir = write(li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey"), "bykey")
    val (zTouch, zTotal) = filesTouched(zDir, xMax, yMax)
    val (oTouch, oTotal) = filesTouched(oDir, xMax, yMax)
    assert(zTotal >= 8 && oTotal >= 8, "need enough files for pruning to mean anything")
    // orderkey clustering is uncorrelated with (partkey, suppkey): every
    // file's box spans ~the full plane and nothing prunes
    assert(oTouch == 0 || oTouch == oTotal,
      s"uncorrelated layout unexpectedly localized: $oTouch/$oTotal")
    assert(zTouch < zTotal / 2,
      s"z-layout should confine the box to a minority of files: $zTouch/$zTotal")
    // the files the box query reads under z-layout hold every matching row
    val expect = li.where(col("l_partkey") <= xMax && col("l_suppkey") <= yMax)
      .count()
    val got = spark.read.parquet(zDir)
      .where(col("l_partkey") <= xMax && col("l_suppkey") <= yMax).count()
    assert(got == expect)
  }
}
