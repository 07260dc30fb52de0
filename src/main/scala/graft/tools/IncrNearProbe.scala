package graft.tools

import graft.{GraftSession, Tables}
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Stage-wise attribution for q_dedup_incr_near's bimodal wall (r15
  * watch item): times the operator's internal stages separately —
  * signature/banding passes, the band-bucket probe join, and the
  * Jaccard verify — across several same-JVM repetitions, so a slow
  * reading decomposes into WHICH stage moved.
  * Usage: dev/run.sh graft.tools.IncrNearProbe <sfDir> [reps]
  */
object IncrNearProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = GraftSession.builder("graft-incrnear-probe", 32)
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.load(spark, sfDir, "documents")
    val history = docs.where(col("doc_id") % 3 === 0).select("doc_id", "text")
    val batch = docs.where(col("doc_id") % 3 =!= 0).select("doc_id", "text")
      .unionByName(docs.where(col("doc_id") % 3 === 0 && col("doc_id") < 120)
        .select((col("doc_id") + lit(5000000L)).as("doc_id"),
          concat(col("text"), lit(" graftzz")).as("text")))
    // warmup: page cache + codegen
    noop(docs)
    (1 to reps).foreach { i =>
      val tSig = time {
        noop(Dedup.minhashSignatures(batch))
        noop(Dedup.minhashSignatures(history))
      }
      val bB = Dedup.lshBands(Dedup.minhashSignatures(batch), 8, 2)
        .select(col("doc_id").as("batch_id"), col("band"), col("bkey"))
      val hB = Dedup.lshBands(Dedup.minhashSignatures(history), 8, 2)
        .select(col("doc_id").as("hist_id"), col("band"), col("bkey"))
      val cand = bB.join(hB, Seq("band", "bkey"))
        .select("batch_id", "hist_id").distinct()
      val tCand = time(noop(cand))
      val tFull = time(noop(Dedup.incrementalNearDups(batch, history,
        threshold = 0.8, maxBucket = 1000000)))
      println(f"rep $i%d  sig $tSig%.2f  cand $tCand%.2f  full $tFull%.2f")
    }
    spark.stop()
  }
}
