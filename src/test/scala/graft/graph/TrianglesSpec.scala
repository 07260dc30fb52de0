package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degree-oriented triangle counting + clustering coefficients:
  * correctness against brute-force enumeration, and the fan-out bound
  * that is the whole point of orienting by degree.
  */
class TrianglesSpec extends SparkSpec {

  private def edgeDf(es: Seq[(Long, Long)]) = {
    import spark.implicits._
    es.toDF("doc_a", "doc_b")
  }

  /** Brute-force per-node triangle counts on the driver. */
  private def brute(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = (es ++ es.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val tris = for {
      (a, b) <- es
      c <- adj(a).intersect(adj(b)) if c > b
    } yield Seq(a, b, c)
    tris.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  test("K4: every node sits in 3 triangles with coefficient 1") {
    val k4 = for {
      a <- 0L to 3L; b <- (a + 1) to 3L
    } yield (a, b)
    val got = Triangles.clusteringCoefficient(edgeDf(k4))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == (0L to 3L).map(_ -> ((3L, 3L, 1.0))).toMap)
  }

  test("path graph: no triangles, zero coefficients, degree-1 ends defined") {
    val path = (0L until 5L).map(i => (i, i + 1))
    val got = Triangles.clusteringCoefficient(edgeDf(path))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.values.forall { case (_, tri, c) => tri == 0L && c == 0.0 })
    assert(got(0L)._1 == 1L && got(3L)._1 == 2L)
  }

  test("oriented enumeration matches brute force on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val es = (0 until 160).map { _ =>
      val a = rnd.nextInt(24).toLong; val b = rnd.nextInt(24).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    val got = Triangles.perNodeTriangles(edgeDf(es))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == brute(es))
  }

  test("degree orientation bounds hub fan-out: a 50-spoke star has max " +
    "out-degree 1, not 50") {
    val star = (1L to 50L).map(sp => (0L, sp))
    val outdeg = Triangles.orientEdges(edgeDf(star))
      .groupBy("src").agg(count(lit(1)).as("od"))
      .agg(max("od")).head().getLong(0)
    // every edge orients spoke→hub (spokes: degree 1 < hub's 50), so each
    // source owns 1 edge; id-ordering would give the hub all 50 and
    // C(50,2) = 1225 wedges
    assert(outdeg == 1L)
    assert(Triangles.triangleList(edgeDf(star)).count() == 0L)
  }

  test("oriented wedge total is a fraction of the unoriented wedge mass " +
    "on a hub-plus-clique graph") {
    // hub 100 touches every K6 clique node; all 7 nodes have degree 6
    val clique = for { a <- 0L to 5L; b <- (a + 1) to 5L } yield (a, b)
    val es = clique ++ (0L to 5L).map(n => (n, 100L))
    val got = Triangles.perNodeTriangles(edgeDf(es))
      .agg(sum("n_triangles")).head().getLong(0)
    assert(got == brute(es).values.sum) // 3 slots per triangle, both sides
    val oriented = Triangles.orientEdges(edgeDf(es))
      .groupBy("src").agg(count(lit(1)).as("od"))
      .select((sum(col("od") * (col("od") - 1)) / 2).cast("long"))
      .head().getLong(0)
    val unoriented = Triangles.degrees(edgeDf(es))
      .select((sum(col("degree") * (col("degree") - 1)) / 2).cast("long"))
      .head().getLong(0)
    // 35 oriented wedges vs 105 unoriented: enumeration only ever looks
    // "up" the (degree, id) order, so every wedge pair is inspected once
    assert(oriented == 35L && unoriented == 105L)
  }

  test("mixed coefficients: triangle with a pendant edge") {
    // 0-1-2 triangle, 3 pendant on 2: deg = (2,2,3,1);
    // coeff(0)=coeff(1)=1, coeff(2)=2·1/(3·2)=1/3, coeff(3)=0
    val es = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L))
    val got = Triangles.clusteringCoefficient(edgeDf(es))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(
      0L -> ((2L, 1L, 1.0)), 1L -> ((2L, 1L, 1.0)),
      2L -> ((3L, 1L, 0.333333)), 3L -> ((1L, 0L, 0.0))))
  }
}
