package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-oriented triangle counting and local clustering coefficients
  * over an undirected edge set — the cohesion diagnostics a dedup /
  * similarity graph feeds into corpus curation (a doc in a dense
  * triangle clique is boilerplate; a high-degree, low-coefficient doc
  * is a template hub stitching unrelated near-dup groups together).
  *
  * The join strategy is the classical degree orientation (Chiba–
  * Nishizeki / "forward" algorithm): orient every undirected edge from
  * its lower-(degree, id) endpoint to its higher one, enumerate wedges
  * only at each triangle's LOWEST-ranked vertex, and close them against
  * the oriented edge list. Per-node wedge fan-out is then C(outdeg, 2)
  * with outdeg bounded by O(√m) (more tightly, by the graph's
  * arboricity) instead of C(deg, 2) at raw hubs — the refinement
  * [[graft.PipelineQueries]]'s q_triangles doc note names as the
  * production form of its id-ordered stand-in. A 10⁶-degree boilerplate
  * hub under id-ordering can own ~5·10¹¹ wedges; degree-ordered it owns
  * only wedges toward still-higher-degree nodes, of which there are at
  * most √m.
  *
  * Everything is equi-joins on vertex keys (three shuffles: degree agg,
  * wedge self-join, closing join) — no windows over unbounded
  * neighborhoods, no driver-side state. Determinism: ties in degree
  * break by vertex id, so the orientation — and every intermediate
  * frame — is a pure function of the edge set.
  */
object Triangles {

  /** Per-node degree of the undirected edge set `(a, b)` (assumed
    * deduplicated with a < b, as [[graft.dedup.Dedup.minhashCandidates]]
    * emits). One union + one agg; map-side combined.
    */
  def degrees(edges: DataFrame, a: String = "doc_a", b: String = "doc_b"): DataFrame =
    edges.select(col(a).as("node"))
      .unionAll(edges.select(col(b).as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

  /** The degree-oriented directed edge list: one row per undirected
    * edge, `src` → `dst` with (degree, id) of `src` strictly below
    * (degree, id) of `dst`; `ddeg` carries dst's degree so downstream
    * wedge enumeration can rank endpoints without another join.
    */
  def orientEdges(edges: DataFrame, a: String = "doc_a", b: String = "doc_b"): DataFrame = {
    val deg = degrees(edges, a, b)
    val e = edges
      .join(deg.select(col("node").as(a), col("degree").as("_da")), a)
      .join(deg.select(col("node").as(b), col("degree").as("_db")), b)
    val aFirst = col("_da") < col("_db") ||
      (col("_da") === col("_db") && col(a) < col(b))
    e.select(
      when(aFirst, col(a)).otherwise(col(b)).as("src"),
      when(aFirst, col(b)).otherwise(col(a)).as("dst"),
      when(aFirst, col("_db")).otherwise(col("_da")).as("ddeg"))
  }

  /** Each triangle exactly once as (x, y, z) with rank(x) < rank(y) <
    * rank(z) under the (degree, id) order: wedges (x→y, x→z) enumerated
    * at the lowest-ranked vertex, closed by the oriented y→z edge.
    *
    * The edge frame feeds the degree aggregate plus three join sides,
    * so both it and the oriented list are lineage-truncated (the
    * tf-table/shingle-table discipline) — an expensive upstream edge
    * producer (the LSH candidate join) computes exactly once, not once
    * per plan reference.
    */
  def triangleList(edges: DataFrame, a: String = "doc_a", b: String = "doc_b"): DataFrame =
    triangleListOf(graft.ops.Checkpoints.truncate(edges), a, b)

  private def triangleListOf(e: DataFrame, a: String, b: String): DataFrame = {
    val dir = graft.ops.Checkpoints.truncate(orientEdges(e, a, b))
    val e1 = dir.select(col("src"), col("dst").as("y"), col("ddeg").as("_dy"))
    val e2 = dir.select(col("src"), col("dst").as("z"), col("ddeg").as("_dz"))
    val wedges = e1.join(e2, "src")
      .where(col("_dy") < col("_dz") ||
        (col("_dy") === col("_dz") && col("y") < col("z")))
    wedges
      .join(dir.select(col("src").as("y"), col("dst").as("z")), Seq("y", "z"))
      .select(col("src").as("x"), col("y"), col("z"))
  }

  /** Per-node triangle participation counts — only nodes in ≥1
    * triangle, matching the id-ordered q_triangles contract (the two
    * algorithms are output-identical; only join fan-out differs).
    */
  def perNodeTriangles(edges: DataFrame, a: String = "doc_a", b: String = "doc_b"): DataFrame =
    perNodeOf(graft.ops.Checkpoints.truncate(edges), a, b)

  private def perNodeOf(e: DataFrame, a: String, b: String): DataFrame =
    triangleListOf(e, a, b)
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))

  /** Local clustering coefficient per node: 2·tri / (deg·(deg−1)),
    * 0 for degree-1 nodes, over every node of the edge set. The
    * double division is written with one fixed association and rounded
    * at 6 so the value replays bit-identically on any engine. The edge
    * frame is truncated once and shared by the degree aggregate and the
    * whole triangle pipeline.
    */
  def clusteringCoefficient(edges: DataFrame, a: String = "doc_a", b: String = "doc_b"): DataFrame = {
    val e = graft.ops.Checkpoints.truncate(edges)
    degrees(e, a, b)
      .join(perNodeOf(e, a, b), Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") > 1,
          round((lit(2.0) * coalesce(col("n_triangles"), lit(0L))) /
            (col("degree") * (col("degree") - lit(1.0))), 6))
          .otherwise(lit(0.0)).as("coeff"))
  }
}
