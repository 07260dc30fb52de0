package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** d5/d5k-shaped SemDeDup scale probe: times semanticNearDups on the
  * bench's exact 1x and 10x embedding frames at fixed and
  * corpus-proportional k (min-of-2, noop sink) — for A/B-ing the
  * centroid-assignment path without a full bench pass.
  * Usage: dev/run.sh graft.tools.KmScaleProbe [sfDir]
  */
object KmScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-km-scale-probe", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.load(spark, sfDir, "embeddings")
      .write.format("noop").mode("overwrite").save()
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    val emb1x = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val emb10x = Tables.load(spark, sfDir, "embeddings")
      .crossJoin(spark.range(10).select(col("id").as("_k")))
      .select((col("vec_id") * 10 + col("_k")).as("vec_id"), col("embedding"))
    Seq(("1x_k16", emb1x, 16), ("10x_k16", emb10x, 16),
        ("10x_k160", emb10x, 160)).foreach { case (tag, e, k) =>
      def once(): Double = time(
        graft.dedup.Dedup.semanticNearDups(e, k = k, iters = 2,
            threshold = 0.99)
          .write.format("noop").mode("overwrite").save())
      val t = math.min(once(), once())
      println(f"semantic_$tag%-10s $t%.3f s")
    }
    spark.stop()
  }
}
