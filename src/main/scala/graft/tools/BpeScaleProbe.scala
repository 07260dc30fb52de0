package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off sizing probe for the d21 production-vocab BPE encode trend:
  * times [[graft.text.Bpe.byteEncodeCounts]] under a frequency-ranked
  * merge table at 128 vs 1024 merges (the merge-count axis) and at 1x
  * vs 10x raw-replicated documents (the occurrence axis, vocabulary
  * fixed) — the two claims the d21 bench line certifies. Not part of
  * the bench artifact; run ad hoc before freezing the bench registry.
  * Usage: dev/run.sh graft.tools.BpeScaleProbe <sfDir>
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("graft-bpe-probe", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.Bpe
    val docs = Tables.load(spark, sfDir, "documents")
    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    exec(docs)
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    val docs10 = docs
      .crossJoin(spark.range(10).select(col("id").as("_k")))
      .withColumn("doc_id", col("doc_id") + col("_k") * lit(1000000000L))
      .drop("_k")
    // token-diversified training corpus (the ampDocs transform): ~10x
    // pre-token vocabulary, so the merge space clears 1k
    val diversified = docs
      .crossJoin(spark.range(10).select(col("id").as("_k")))
      .withColumn("doc_id", col("doc_id") + col("_k") * lit(1000000000L))
      .withColumn("text", array_join(
        transform(split(col("text"), "\\s+"),
          t => concat(t, lit("~"), col("_k"))), " "))
      .drop("_k")
    val t0 = System.nanoTime()
    val merges = Bpe.batchedByteMerges(diversified, 1024)
    println(f"batched merges trained: ${merges.size} in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    def run(tag: String, d: DataFrame, m: Seq[Bpe.Merge]): Unit = {
      val t = math.min(
        time(exec(Bpe.byteEncodeCounts(d, m))),
        time(exec(Bpe.byteEncodeCounts(d, m))))
      println(f"$tag%-28s ${t}%.3f s")
    }
    run("encode_1x_128m", docs, merges.take(128))
    run("encode_1x_1024m", docs, merges)
    run("encode_10xraw_1024m", docs10, merges)
    spark.stop()
  }
}
