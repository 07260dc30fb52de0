package graft.text

import graft.SparkSpec
import graft.ops.GlobalRank
import org.apache.spark.sql.functions._

class TokenBlocksSpec extends SparkSpec {

  test("withGlobalCumSum matches a driver-side prefix sum over the same order") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (i.toLong, (i % 13) + 1L))
    val df = rows.toDF("k", "w").repartition(11)
    val got = GlobalRank.withGlobalCumSum(df, Seq(col("k")), "w")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = rows.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (k, w)) => (k, acc + w) }
      .sliding(2).map { case Seq((_, acc), (k, _)) => k -> acc }.toMap
    assert(got == want)
  }

  test("assign: spans tile the token stream contiguously in md5 order") {
    import spark.implicits._
    val docs = (1 to 300).map(i => (i.toLong, s"doc $i " + ("x " * (i % 9))))
      .toDF("doc_id", "text")
    val a = TokenBlocks.assign(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")) + 1, blockTokens = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // contiguous: sorted by start, each start = previous start + w
    val byStart = a.sortBy(_._3)
    byStart.sliding(2).foreach { case Array((_, w1, s1, _, _), (_, _, s2, _, _)) =>
      assert(s2 == s1 + w1, "token spans must tile with no gap or overlap")
    }
    assert(byStart.head._3 == 0L)
    // block range arithmetic
    a.foreach { case (_, w, s, fb, lb) =>
      assert(fb == s / 16 && lb == (s + w - 1) / 16 && w >= 1)
    }
    // deterministic md5 order: same as the split/shuffle primitives use
    val order = a.sortBy(_._3).map(_._1)
    val expect = (1 to 300).map(_.toLong).sortBy(k =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, k))
    assert(order.toSeq == expect)
  }

  test("manifest: every block is exactly full except the last; docs fully covered") {
    import spark.implicits._
    val docs = (1 to 300).map(i => (i.toLong, "t " * ((i % 23) + 1)))
      .toDF("doc_id", "text")
    val L = 32L
    val assigned = TokenBlocks.assign(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")) + 1, L)
    val m = TokenBlocks.manifest(assigned, L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .map { case (doc, w, _, block, off) => (doc, w, block, off) }
    val total = assigned.agg(sum("w")).head.getLong(0)
    val byBlock = TokenBlocks.manifest(assigned, L)
      .groupBy("block_id").agg(sum("len").as("filled"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lastBlock = byBlock.keys.max
    byBlock.foreach { case (b, filled) =>
      if (b < lastBlock) assert(filled == L, s"block $b under-filled: $filled")
      else assert(filled == total - lastBlock * L)
    }
    // per-doc coverage: slices add back to the doc's weight
    val perDoc = TokenBlocks.manifest(assigned, L)
      .groupBy("doc_id").agg(sum("len").as("covered"), first("w").as("w"))
      .collect()
    perDoc.foreach(r => assert(r.getLong(1) == r.getLong(2)))
    // slice bounds
    m.foreach { case (_, _, _, off) => assert(off >= 0 && off < L) }
  }

  test("assign is independent of input partitioning") {
    import spark.implicits._
    val docs = (1 to 200).map(i => (i.toLong, "w " * (i % 17)))
      .toDF("doc_id", "text")
    def run(parts: Int) = TokenBlocks.assign(docs.repartition(parts), "doc_id",
      TextAnalysis.tokenCount(col("text")) + 1, 8)
      .collect().map(_.toSeq).toSet
    assert(run(1) == run(13))
  }
}
