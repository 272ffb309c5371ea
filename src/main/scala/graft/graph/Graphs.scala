package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph statistics beyond the component/propagation
  * family (graft.ml.Dedup.connectedComponents, Matrix.propagate).
  *
  * The reference's graph work is matrix-shaped (reference
  * `mathematics/Matrix.scala` tutorials: grammian co-occurrence,
  * PageRank); triangle counting is the classic statistic that CANNOT
  * be a plain grammian at scale — the naive wedge join is
  * Σ deg(v)² and one celebrity node detonates it. This module uses
  * degree orientation (Schank–Wagner / "node-iterator++"): orient
  * every edge from its lower-(degree, id) endpoint to the higher one,
  * enumerate wedges only between OUT-neighbors, and close them
  * against the edge set. Out-degrees are bounded by O(√m), so wedge
  * volume is O(m^{3/2}) regardless of skew — the property that makes
  * the plan survive a power-law graph at 100 TB.
  */
object Graphs {

  /** Canonical undirected edge set: (u, v) with u < v, self-loops and
    * duplicate/reverse sightings collapsed.
    */
  def canonicalEdges(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame =
    edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** Per-node triangle participation over an undirected graph:
    * returns (node, degree, triangles, clustering_coeff) for every
    * node of the canonicalized input — `triangles` = number of
    * triangles containing the node (0 included), `clustering_coeff` =
    * 2·T / (deg·(deg−1)), 0.0 for degree < 2.
    *
    * Plan shape: canonicalize + degree count (two hash aggregates),
    * two joins to attach endpoint degrees, the wedge self-join on the
    * oriented out-adjacency (the O(m^{3/2})-bounded step), one closing
    * join against the canonical edge set, then an explode-and-count.
    * Every join is key-hashed; nothing is quadratic in any node's
    * degree thanks to the orientation.
    */
  def triangleCounts(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = canonicalEdges(edges, srcCol, dstCol)
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

    // orient from lower (degree, id) to higher: out-degree ≤ O(√m)
    val withDeg = e
      .join(deg.select(col("node").as("u"), col("degree").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("degree").as("dv")), "v")
    val oriented = withDeg.select(
      when(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("a"), col("v").as("b")))
        .otherwise(struct(col("v").as("a"), col("u").as("b")))
        .as("o"))
      .select(col("o.a").as("a"), col("o.b").as("b"))

    // wedges between out-neighbors (b1 < b2 so each wedge once), then
    // close against the canonical edge set — (b1, b2) is already in
    // canonical u < v form
    val o1 = oriented.select(col("a"), col("b").as("b1"))
    val o2 = oriented.select(col("a"), col("b").as("b2"))
    val wedges = o1.join(o2, "a").filter(col("b1") < col("b2"))
    val triangles = wedges.join(
      e.select(col("u").as("b1"), col("v").as("b2")), Seq("b1", "b2"))

    val perNode = triangles
      .select(explode(array(col("a"), col("b1"), col("b2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))

    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") < 2, lit(0.0))
          .otherwise(col("triangles") * 2.0 /
            (col("degree") * (col("degree") - 1L)))
          .as("clustering_coeff"))
  }

  /** Global triangle count: Σ per-node triangles / 3, as a 1-row
    * (n_triangles, n_nodes, n_edges, global_clustering) summary.
    * `global_clustering` is the transitivity ratio 3·T / #wedges with
    * #wedges = Σ deg·(deg−1)/2.
    */
  def triangleSummary(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val per = triangleCounts(edges, srcCol, dstCol)
    per.agg(
      (sum("triangles") / 3).cast("long").as("n_triangles"),
      count(lit(1)).as("n_nodes"),
      (sum("degree") / 2).cast("long").as("n_edges"),
      // transitivity = 3T / #wedges; Σ triangles = 3T and #wedges =
      // Σ deg·(deg−1)/2, so the ratio is 2·Σtriangles / Σdeg·(deg−1)
      when(sum(col("degree") * (col("degree") - 1L)) > 0,
        sum("triangles") * 2.0 /
          sum(col("degree") * (col("degree") - 1L)))
        .otherwise(lit(0.0)).as("global_clustering"))
  }
}
