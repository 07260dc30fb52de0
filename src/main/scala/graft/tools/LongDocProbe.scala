package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Measures the stride-1 window path on one pathological document: a
  * corpus of 2000 × 4 KB docs (with planted shifted dups, so the cut
  * path does real work) plus ONE unique L-MB doc. This probe found
  * BOTH charWindows cliffs: the quadratic per-window UTF8String
  * substring walk (jstack-visible; OOM/hours at 32 MB on the old
  * in-task paths) and the one-task skew — and now measures the sliced
  * +spread path that replaced them (93 s end-to-end at 32 MB). The
  * optional spreadChars arg exercises the sparse-mode threshold.
  * Usage: dev/run.sh graft.tools.LongDocProbe <MB> [spreadChars]
  */
object LongDocProbe {
  def main(args: Array[String]): Unit = {
    val mb = args.headOption.map(_.toInt).getOrElse(8)
    val spread = args.lift(1).map(_.toInt)
    val spark = GraftSession.builder("graft-longdoc-probe", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def soup(seed: Int, n: Int): String = {
      val rnd = new scala.util.Random(seed)
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    val small = (0 until 1000).flatMap { k =>
      val span = soup(500 + k, 120)
      Seq(
        (2L * k, soup(1000 + k, 2000) + span + soup(2000 + k, 1976)),
        (2L * k + 1, soup(3000 + k, 2000 + k % 17) + span
          + soup(4000 + k, 1976)))
    }
    val docs = (small :+ (999999L, soup(9, mb * (1 << 20))))
      .toDF("doc_id", "text").repartition(32).cache()
    docs.count()
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def once(): Double = time {
      val out = spread match {
        case Some(sc) => graft.dedup.Dedup.substringTrimExact(docs,
          spreadChars = sc)
        case None => graft.dedup.Dedup.substringTrimExact(docs)
      }
      val r = out.agg(sum("dropped_windows"), sum("trimmed_len")).head()
      println(s"dropped=${r.getLong(0)} trimmedLen=${r.getLong(1)}")
    }
    val t = math.min(once(), once())
    println(f"substringTrimExact ${mb}MB spread=$spread: $t%.1f s")
    spark.stop()
  }
}
