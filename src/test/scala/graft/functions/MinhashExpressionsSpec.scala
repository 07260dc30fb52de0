package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinhashExpressionsSpec extends SparkSpec {

  /** The k-pass higher-order formulation MinhashMins replaced (r16) —
    * kept here as the reference semantics the one-pass codegen
    * expression must reproduce value for value.
    */
  private def referenceMins(xs: org.apache.spark.sql.Column, k: Int) =
    array((0 until k).map { i =>
      array_min(transform(xs, v =>
        (v * graft.dedup.Dedup.minhashA(i) + graft.dedup.Dedup.minhashB(i))
          % graft.dedup.Dedup.MinhashP))
    }: _*)

  test("minhash_mins equals the k array_min(transform) passes it replaced") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong().abs % graft.dedup.Dedup.MinhashP)
    }
    val df = rows.toDF("xs")
    val both = df.select(
      MinhashExpressions.minhashMins(col("xs"), 8).as("fast"),
      referenceMins(col("xs"), 8).as("ref"))
    assert(both.where(col("fast") =!= col("ref")).count() == 0)
    // and under codegen'd projection the values survive a shuffle intact
    val agg = df.select(explode(
        MinhashExpressions.minhashMins(col("xs"), 4)).as("m"))
      .agg(sum("m")).head().getLong(0)
    val ref = df.select(explode(referenceMins(col("xs"), 4)).as("m"))
      .agg(sum("m")).head().getLong(0)
    assert(agg == ref)
  }

  test("null elements are skipped and all-null/empty arrays yield null") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Long](5L, null, 9L)),
      (2L, Seq[java.lang.Long](null, null)),
      (3L, Seq.empty[java.lang.Long])
    ).toDF("id", "xs")
    val r = df.select(col("id"),
        MinhashExpressions.minhashMins(col("xs"), 3).as("m"),
        referenceMins(col("xs"), 3).as("ref"))
      .collect().map(x => x.getLong(0) -> (x.get(1), x.get(2))).toMap
    assert(r(1L)._1 == r(1L)._2) // nulls skipped, mins match array_min
    assert(r(2L)._1 == null)     // no usable element → null signature
    assert(r(3L)._1 == null)
  }
}
