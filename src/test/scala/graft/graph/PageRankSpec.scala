package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {

  /** Driver-side replay of the exact quantized-trajectory semantics. */
  private def replay(edges: Seq[(String, String)], iters: Int,
                     d: Double = 0.85): Map[String, Double] = {
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val es = edges.distinct
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val n = nodes.size.toDouble
    val outdeg = es.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> r9(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      val contrib = es.groupBy(_._2).view.mapValues(in =>
        r9(in.map { case (u, _) => r(u) / outdeg(u) }.sum)).toMap
      val mass = r9(nodes.filterNot(outdeg.contains).map(r).sum)
      r = nodes.map(v => v ->
        r9((1 - d) / n + d * (contrib.getOrElse(v, 0.0) + mass / n))).toMap
    }
    r
  }

  test("matches a hand-replayed trajectory on a graph with a dangling sink") {
    import spark.implicits._
    // D is dangling; C collects from everyone
    val edges = Seq(("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"), ("A", "D"))
    val got = PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == replay(edges, 3))
  }

  test("rank mass is conserved (sums to ~1 under 9-decimal quantization)") {
    import spark.implicits._
    val edges = (1 to 100).map(i => (s"n$i", s"n${(i * 7) % 100 + 1}"))
    val total = PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 4)
      .agg(sum("rank")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6, s"rank mass drifted: $total")
  }

  test("deterministic and partitioning-independent") {
    import spark.implicits._
    val edges = (1 to 300).map(i => (s"u${i % 40}", s"u${(i * 13) % 37}"))
    def run(parts: Int) =
      PageRank.pageRank(edges.toDF("src", "dst").repartition(parts),
        "src", "dst", iters = 2)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val a = run(1)
    assert(a == run(11) && a.nonEmpty)
    assert(a == replay(edges, 2))
  }
}
