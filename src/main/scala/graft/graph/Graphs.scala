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

  /** Co-occurrence pair multiset from a (group, item) incidence list:
    * one row per (group, unordered item pair), src < dst — the
    * co-purchase/co-tag edge-build primitive. Exactly the multiset the
    * classic form produces (distinct incidence, self-join on the group
    * key, i < j filter) but with ONE exchange instead of that form's
    * distinct + both join sides: a single group-keyed aggregate builds
    * each group's sorted distinct item array (collect_set collapses
    * duplicate incidences) and pair enumeration runs inside
    * whole-stage codegen ([[org.apache.spark.sql.graft.PackedPairs]]).
    * The quadratic-in-group-size volume is inherent and identical to
    * the join form's; `maxGroupSize` makes the contract LOUD: a group
    * above it raises with a remedy instead of materializing an
    * n(n−1)/2 pair array in one row (the old streaming self-join
    * merely got slow on the same degenerate group; this primitive
    * must not trade that for a multi-GB row). The guard REJECTS, never
    * silently drops — capping is a caller decision.
    *
    * `packedIds = true` (default) requires item ids < 2³¹ (fails
    * loudly otherwise); set false for wider id spaces — the fallback
    * enumerates struct pairs via interpreted higher-order transforms,
    * same single-exchange shape, slower per row.
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
      packedIds: Boolean = true, maxGroupSize: Int = 16384): DataFrame = {
    require(maxGroupSize >= 2, s"maxGroupSize must be >= 2, got $maxGroupSize")
    val arrs = df
      .select(col(groupCol).as("g"), col(itemCol).cast("long").as("i"))
      .groupBy("g")
      .agg(sort_array(collect_set(col("i"))).as("items"))
      // one size() compare per GROUP — free next to the aggregate
      .select(when(size(col("items")) > maxGroupSize,
          raise_error(concat(
            lit("coOccurrenceEdges: group "), col("g").cast("string"),
            lit(" has "), size(col("items")).cast("string"),
            lit(s" distinct items (> maxGroupSize=$maxGroupSize) — " +
              "cap group sizes upstream or raise maxGroupSize"))))
        .otherwise(col("items")).as("items"))
    if (packedIds)
      arrs.select(explode(org.apache.spark.sql.graft.PairFunctions
          .packed_pairs(col("items"))).as("pk"))
        .select(shiftrightunsigned(col("pk"), 32).as("src"),
          col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("dst"))
    else
      arrs.select(explode(flatten(transform(col("items"), (x, i) =>
          transform(slice(col("items"), i + lit(2), size(col("items"))),
            y => struct(x.as("src"), y.as("dst")))))).as("p"))
        .select(col("p.src").as("src"), col("p.dst").as("dst"))
  }

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
    * two joins to attach endpoint degrees, ONE aggregate building the
    * sorted out-adjacency arrays, and two edge-sized joins feeding the
    * per-edge `array_intersect` — every shuffle is O(m) rows; the
    * O(m^{3/2}) wedge volume is per-task CPU inside the intersection,
    * never an exchanged row stream (an 11.8 s → 5.7 s A/B at sf0.1
    * vs the materialized-wedge join form). Nothing is quadratic in
    * any node's degree thanks to the orientation.
    */
  def triangleCounts(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", compactIds: Boolean = true): DataFrame = {
    // NOT persisted (measured r12): the canonical edge set appears
    // three times in the plan, but ReuseExchange already shares the
    // distinct's shuffle files across those subtrees — an explicit
    // cache only added write cost (5.25 s vs 4.90 s med A/B at
    // sf0.1/32c) and would be an m-row resident at 100 TB
    val e = canonicalEdges(edges, srcCol, dstCol)
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

    // orient from lower (degree, id) to higher: out-degree ≤ O(√m).
    // Hash joins throughout (node-sized build sides) — sort-merge
    // would sort the edge stream twice for no benefit
    val withDeg = e
      .join(deg.select(col("node").as("u"), col("degree").as("du"))
        .hint("shuffle_hash"), "u")
      .join(deg.select(col("node").as("v"), col("degree").as("dv"))
        .hint("shuffle_hash"), "v")
    val oriented = withDeg.select(
      when(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("a"), col("v").as("b")))
        .otherwise(struct(col("v").as("a"), col("u").as("b")))
        .as("o"))
      .select(col("o.a").as("a"), col("o.b").as("b"))

    // Edge-iterator with out-adjacency intersection: in the
    // orientation DAG every triangle has exactly one source node with
    // both outgoing edges, so for each oriented edge (a→b) the third
    // vertices are precisely N⁺(a) ∩ N⁺(b) — each triangle found
    // exactly once, at its source edge. The O(m^{3/2}) wedge volume is
    // spent INSIDE array_intersect (per-task CPU over ≤O(√m)-element
    // arrays), never materialized as a row stream through an exchange
    // — the join traffic is 3 edge-sized inputs, and only actual
    // triangles (≪ wedges) come out. This is what makes the plan
    // survive both a skew-free dense graph and a power-law one.
    // compact (int) adjacency when ids fit 32 bits: the first oa join
    // attaches `an` to every oriented edge, and that array RIDES THE
    // EXCHANGE feeding the second join (r11 metrics: 697 MB at sf0.1,
    // the plan's largest shuffle) — int elements halve it. Ids ≥ 2³¹
    // need compactIds = false (long arrays, same plan).
    // LOUD contract (ADVICE r11): with ansi off a bare cast("int")
    // silently wraps ids >= 2³¹ and two distinct longs can collapse to
    // one int — corrupt triangle counts with no error. Every compacted
    // value flows through this cast (adjacency arrays hold only `b`
    // endpoints), so one guard here covers the whole compact path.
    val nbrCol =
      if (compactIds)
        when(col("b") < Int.MinValue.toLong || col("b") > Int.MaxValue.toLong,
          raise_error(concat(
            lit("triangleCounts: node id "), col("b").cast("string"),
            lit(" outside 32-bit range — pass compactIds=false"))))
          .otherwise(col("b")).cast("int")
      else col("b")
    val oa = oriented.groupBy(col("a"))
      .agg(sort_array(collect_list(nbrCol)).as("nbrs"))
    val intersected =
      if (compactIds)
        org.apache.spark.sql.graft.VectorFunctions
          .sorted_intersect_int(col("an"), col("bn"))
      else
        org.apache.spark.sql.graft.VectorFunctions
          .sorted_intersect(col("an"), col("bn"))
    val triangles = oriented
      .join(oa.select(col("a"), col("nbrs").as("an"))
        .hint("shuffle_hash"), "a")
      .join(oa.select(col("a").as("b"), col("nbrs").as("bn"))
        .hint("shuffle_hash"), "b")
      .select(col("a"), col("b"),
        // native merge-walk over the sorted adjacency arrays — the
        // codegen'd SortedIntersect beats array_intersect's per-row
        // hash set on the O(m^{3/2}) wedge volume
        explode(intersected).as("c0"))
      .select(col("a"), col("b"), col("c0").cast("long").as("c"))

    val perNode = triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))

    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") < 2, lit(0.0))
          .otherwise(col("triangles") * 2.0 /
            (col("degree") * (col("degree") - 1L)))
          .as("clustering_coeff"))
  }

  /** k-core extraction: iteratively peel nodes of degree < k until
    * fixpoint and return the surviving nodes with their degree INSIDE
    * the core (all ≥ k). The standard graph-quality primitive — link-
    * farm/spam cores, collaboration kernels, "dense center" selection
    * for graph-informed corpus filtering.
    *
    * Scale shape: each round is one degree aggregate + two anti-joins
    * against the (tiny, shrinking) below-threshold node set, with a
    * `localCheckpoint` lineage cut per round (the [[graft.ml.Dedup
    * .connectedComponents]] iteration idiom); rounds are bounded by
    * the peeling depth, ≈ O(log n) on real graphs. The convergence
    * probe is one driver-side count of the just-removed set — a
    * scalar, nothing distributed is retained.
    */
  def kCore(edges: DataFrame, k: Int, srcCol: String = "src",
      dstCol: String = "dst", maxIter: Int = 50): DataFrame = {
    require(k >= 1, "k must be at least 1")
    var e = canonicalEdges(edges, srcCol, dstCol).localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val deg = e.select(col("u").as("node"))
        .unionAll(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
      val low = deg.filter(col("degree") < k)
        .select("node").localCheckpoint()
      if (low.isEmpty) converged = true
      else e = e
        .join(low.select(col("node").as("u")), Seq("u"), "left_anti")
        .join(low.select(col("node").as("v")), Seq("v"), "left_anti")
        .localCheckpoint()
      i += 1
    }
    e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
  }

  /** Per-node core numbers (the largest k whose k-core contains the
    * node) via distributed h-index iteration (Lu et al. 2016): start
    * from degrees; each round a node's estimate becomes the h-index
    * of its neighbors' estimates (the largest h with ≥ h neighbors
    * ≥ h). Estimates only decrease and converge to exact coreness —
    * on real graphs in ~O(10) rounds, each one edge-keyed join +
    * per-node sorted fold over bounded neighbor lists.
    */
  def coreNumbers(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxIter: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e0 = canonicalEdges(edges, srcCol, dstCol)
    val und = e0.select(col("u").as("a"), col("v").as("b"))
      .unionAll(e0.select(col("v").as("a"), col("u").as("b")))
      .localCheckpoint()
    var est = und.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("est")).localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = und
        .join(est.select(col("node").as("b"), col("est").as("nb")), "b")
        .as[(Long, Long, Long)]
        .map { case (_, a, nb) => (a, nb) }
        .groupByKey(_._1)
        .mapGroups { (node, it) =>
          // h-index of neighbor estimates: sort desc, largest h with
          // value(h-1) >= h; neighbor lists are degree-bounded
          val vs = it.map(_._2).toArray
          java.util.Arrays.sort(vs)
          var h = 0L
          var idx = vs.length - 1
          while (idx >= 0 && vs(idx) >= h + 1) { h += 1; idx -= 1 }
          (node, h)
        }
        .toDF("node", "next").localCheckpoint()
      val joined = est.join(next, "node")
      converged = joined.filter(col("next") =!= col("est")).isEmpty
      est = next.select(col("node"), col("next").as("est"))
      i += 1
    }
    est.select(col("node"), col("est").as("core"))
  }

  /** Personalized PageRank: random walk with restart to a SEED
    * distribution instead of the uniform vector — "importance relative
    * to these nodes", the standard related-items / local-relevance /
    * expansion primitive ([[graft.examples.WeightedPageRank]] keeps
    * the reference's global variant; this is the directed, seeded
    * form). Dangling mass returns through the restart distribution,
    * so Σ ppr = 1 is an exact per-iteration invariant:
    * r' = α·restart + (1−α)·(Pᵀr + dangling·restart).
    *
    * `edges`: (srcCol, dstCol[, weightCol]) directed; `seeds`:
    * (node, weight) — normalized internally, broadcast (seed sets are
    * small by contract). Per iteration: one ranks⋈edges shuffle + one
    * contribution aggregate + a scalar dangling probe + a broadcast
    * restart join, `localCheckpoint` lineage cut — O(m) at any
    * iteration count.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      alpha: Double = 0.15, iters: Int = 20, srcCol: String = "src",
      dstCol: String = "dst", weightCol: Option[String] = None)
      : DataFrame = {
    require(alpha > 0 && alpha < 1 && iters >= 1)
    val e0 = weightCol match {
      case Some(w) => edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), col(w).cast("double").as("w"))
        .filter(col("w") > 0)
      case None => edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), lit(1.0).as("w"))
    }
    val outW = e0.groupBy("src").agg(sum("w").as("outw"))
    val eNorm = e0.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("outw")).as("p"))
      .localCheckpoint()
    val restart0 = seeds.select(col("node").cast("long").as("src"),
      col("weight").cast("double").as("rw")).filter(col("rw") > 0)
    val sTot = restart0.agg(coalesce(sum("rw"), lit(0.0))).head().getDouble(0)
    require(sTot > 0, "seeds must carry positive weight")
    val restart = broadcast(restart0
      .select(col("src"), (col("rw") / sTot).as("restart"))
      .localCheckpoint())
    val nodes = e0.select("src")
      .unionAll(e0.select(col("dst").as("src")))
      .unionAll(restart.select("src"))
      .distinct().localCheckpoint()
    var ranks = nodes.join(restart, Seq("src"), "left")
      .select(col("src"), coalesce(col("restart"), lit(0.0)).as("r"))
      .localCheckpoint()
    var i = 0
    while (i < iters) {
      val contrib = ranks.join(eNorm, "src")
        .select(col("dst").as("src"), (col("r") * col("p")).as("c"))
        .groupBy("src").agg(sum("c").as("c"))
      // every non-dangling node forwards exactly its rank (p sums to
      // 1 per source), so dangling mass = 1 − forwarded mass; carried
      // as a broadcast 1-row aggregate — no driver action per
      // iteration (the WeightedPageRank.iterate idiom)
      val dead = contrib.agg(
        (lit(1.0) - coalesce(sum("c"), lit(0.0))).as("__dead"))
      ranks = nodes.join(contrib, Seq("src"), "left")
        .join(restart, Seq("src"), "left")
        .crossJoin(broadcast(dead))
        .select(col("src"),
          (lit(alpha) * coalesce(col("restart"), lit(0.0)) +
            lit(1 - alpha) * (coalesce(col("c"), lit(0.0)) +
              col("__dead") * coalesce(col("restart"), lit(0.0)))).as("r"))
        .localCheckpoint() // eager: contrib is referenced twice, a lazy
      // chain would double the plan per iteration
      i += 1
    }
    ranks.select(col("src").as("node"), col("r").as("ppr"))
  }

  /** Community detection by deterministic synchronous label
    * propagation (Raghavan et al. 2007, made reproducible): every
    * node starts labeled by its own id; each round it adopts the
    * label with the highest weighted vote among its neighbors PLUS
    * its own current label (the self-vote damps the bipartite
    * oscillation synchronous LPA is known for), ties broken to the
    * SMALLEST label — no RNG, no visit-order dependence, identical
    * output on every run and engine. Converges when no label changes
    * (or maxIter). Returns (node, community) with community = the
    * minimum member id reachable as a label — denser-than-component
    * groupings for near-dup cluster splitting, link-farm detection,
    * domain grouping.
    *
    * Scale shape per round: one edge-keyed join to attach neighbor
    * labels, one (node, label) count aggregate, one per-node argmax
    * (max_by over a (count, -label) struct — a hash aggregate, not a
    * window), `localCheckpoint` lineage cut; all shuffles O(m).
    * Convergence probe is a scalar count.
    */
  def labelPropagation(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxIter: Int = 20): DataFrame = {
    val e0 = canonicalEdges(edges, srcCol, dstCol)
    val und = e0.select(col("u").as("a"), col("v").as("b"))
      .unionAll(e0.select(col("v").as("a"), col("u").as("b")))
      .localCheckpoint()
    val nodes = und.select(col("a").as("node")).distinct()
    var labels = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val votes = und
        .join(labels.select(col("node").as("b"), col("label")), "b")
        .select(col("a").as("node"), col("label"))
        .unionAll(labels.select(col("node"), col("label"))) // self-vote
        .groupBy("node", "label").agg(count(lit(1)).as("n"))
      val next = votes.groupBy("node")
        .agg(max_by(col("label"), struct(col("n"), (-col("label")).as("t")))
          .as("label"))
        .localCheckpoint()
      converged = labels.join(next.withColumnRenamed("label", "nl"), "node")
        .filter(col("nl") =!= col("label")).isEmpty
      labels = next
      i += 1
    }
    // canonicalize community ids to the minimum label per community —
    // labels are already node ids, so this is one aggregate + join
    val canon = labels.groupBy("label")
      .agg(min("node").as("community"))
      .withColumn("community", least(col("community"), col("label")))
    labels.join(canon, "label").select("node", "community")
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

  /** Multi-source BFS hop distances over the undirected graph:
    * (node, dist) = minimum number of edges from ANY source node,
    * for every node reachable within `maxHops` (sources themselves at
    * dist 0; unreachable nodes are absent). The frontier-expansion
    * form of the reference's iterative `Job.next` propagation idiom
    * (reference `mathematics/Matrix.scala` propagate tutorials), but
    * with an anti-join visited set so each node is exchanged exactly
    * once over the whole run.
    *
    * Scale shape: the adjacency (both directions) is persisted once
    * and re-joined per round; round k shuffles only frontier-incident
    * edges plus an O(|reached|) anti-join — total traffic O(m + n)
    * across all rounds, never O(m·rounds) for the visited set. A
    * driver-side `isEmpty` on the (persisted) frontier stops early,
    * and per-round persists cut the lineage so round 20 doesn't
    * re-plan round 1.
    */
  def shortestHops(edges: DataFrame, sources: DataFrame,
      maxHops: Int = 10, srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node"): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    val e = canonicalEdges(edges, srcCol, dstCol)
    val adj = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      .transform(persistTracked)
    var dist = sources.select(col(nodeCol).cast("long").as("node"))
      .distinct()
      .withColumn("dist", lit(0L))
      .transform(persistTracked)
    var frontier = dist
    var hop = 0L
    var done = maxHops == 0 || frontier.isEmpty
    while (!done) {
      hop += 1L
      val next = frontier
        .join(adj, frontier("node") === adj("u"))
        .select(col("v").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("dist", lit(hop))
        .transform(persistTracked)
      done = next.isEmpty
      if (!done) {
        dist = dist.unionAll(next).transform(persistTracked)
        frontier = next
        done = hop >= maxHops
      }
    }
    dist
  }

  /** Per-landmark BFS hop distances — [[shortestHops]] generalized to
    * carry the landmark label: the frontier is keyed on
    * (landmark, node), so k landmarks ride ONE iterative loop instead
    * of k BFS runs. Returns (lm, node, dist) for every node within
    * `maxHops` of each landmark.
    *
    * Scale shape per hop: one frontier⋈adjacency hash join + distinct
    * + anti-join against the visited set, state O(k·n) rows max;
    * lineage cut per hop via persistTracked.
    */
  def landmarkDistances(edges: DataFrame, landmarks: DataFrame,
      maxHops: Int = 10, srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node", maxLandmarks: Int = 1000): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    require(maxLandmarks > 0, "maxLandmarks must be positive")
    val e = canonicalEdges(edges, srcCol, dstCol)
    val adj = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      .transform(persistTracked)
    var dist = landmarks.select(col(nodeCol).cast("long").as("lm"))
      .distinct()
      .select(col("lm"), col("lm").as("node"), lit(0L).as("dist"))
      .transform(persistTracked)
    // the visited state is k x n rows — k must be a BOUNDED landmark
    // set (the whole point of the landmark heuristic); fail loudly on
    // a mis-sized call instead of materializing an n x n table. The
    // count materializes the persisted seed state the loop needs
    // anyway, so the guard adds no extra lineage evaluation.
    require(dist.count() <= maxLandmarks,
      s"landmarkDistances: more than $maxLandmarks landmarks - the " +
        "visited state is k x n; pick a small fixed landmark set or " +
        "raise maxLandmarks deliberately")
    var frontier = dist
    var hop = 0L
    var done = maxHops == 0 || frontier.isEmpty
    while (!done) {
      hop += 1L
      val next = frontier
        .join(adj, frontier("node") === adj("u"))
        .select(col("lm"), col("v").as("node")).distinct()
        .join(dist, Seq("lm", "node"), "left_anti")
        .withColumn("dist", lit(hop))
        .transform(persistTracked)
      done = next.isEmpty
      if (!done) {
        dist = dist.unionAll(next).transform(persistTracked)
        frontier = next
        done = hop >= maxHops
      }
    }
    dist
  }

  /** Landmark-approximated harmonic centrality (the k-sweep landmark
    * heuristic of Eppstein–Wang 2004, harmonic form per Boldi–Vigna
    * 2014 §3): Ĥ(v) = Σ over landmarks l ≠ v of 1/d(l, v), with
    * distances from [[landmarkDistances]] within `maxHops` and
    * unreached pairs contributing 0 (the harmonic convention that
    * makes disconnected graphs well-defined). Ranks every node by
    * closeness-to-everywhere at the cost of k BFS sweeps instead of
    * n. Nodes reached by no landmark are absent from the output.
    */
  def harmonicCentrality(edges: DataFrame, landmarks: DataFrame,
      maxHops: Int = 10, srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node", maxLandmarks: Int = 1000): DataFrame =
    landmarkDistances(edges, landmarks, maxHops, srcCol, dstCol, nodeCol,
      maxLandmarks)
      .filter(col("dist") > 0)
      .groupBy("node")
      .agg(count(lit(1)).as("n_landmarks_reached"),
        sum(lit(1.0) / col("dist")).as("harmonic"))

  /** k-truss decomposition (Cohen 2008): iteratively remove edges in
    * fewer than k−2 triangles until fixpoint; the surviving subgraph
    * is the maximal one where EVERY edge is reinforced by ≥ k−2
    * common neighbors. Stricter than k-core (which bounds degree, not
    * triangle support) — the standard community-kernel / spam-farm
    * primitive one notch up the denseness ladder. Returns the
    * fixpoint edges (u < v) with their final `support`.
    *
    * Scale shape per round: one adjacency aggregate (sorted neighbor
    * arrays), two hash joins back onto the edge set, support via the
    * codegen'd sorted-merge intersect (the [[triangleCounts]]
    * kernel), one filter; `localCheckpoint` lineage cut + a scalar
    * driver count as the convergence probe. Rounds are bounded by the
    * peeling depth (≤ max support), typically O(log m) in practice.
    */
  def kTruss(edges: DataFrame, k: Int, srcCol: String = "src",
      dstCol: String = "dst", maxIter: Int = 50): DataFrame = {
    require(k >= 2, "k-truss needs k >= 2")
    require(maxIter >= 1, "maxIter must be positive")
    def withSupport(cur: DataFrame): DataFrame = {
      val adj = cur.select(col("u").as("n"), col("v").as("nb"))
        .unionAll(cur.select(col("v").as("n"), col("u").as("nb")))
        .groupBy("n").agg(sort_array(collect_list(col("nb"))).as("nbrs"))
      cur
        .join(adj.select(col("n").as("u"), col("nbrs").as("un"))
          .hint("shuffle_hash"), "u")
        .join(adj.select(col("n").as("v"), col("nbrs").as("vn"))
          .hint("shuffle_hash"), "v")
        .select(col("u"), col("v"),
          size(org.apache.spark.sql.graft.VectorFunctions
            .sorted_intersect(col("un"), col("vn")))
            .cast("long").as("support"))
    }
    var e = canonicalEdges(edges, srcCol, dstCol).localCheckpoint()
    var m = e.count()
    var done = k == 2 || m == 0L // every graph is its own 2-truss
    var iter = 0
    while (!done && iter < maxIter) {
      iter += 1
      val kept = withSupport(e).filter(col("support") >= k - 2)
        .select("u", "v").localCheckpoint()
      val mNext = kept.count()
      done = mNext == m || mNext == 0L
      m = mNext
      e = kept
    }
    withSupport(e)
  }

  /** HITS hubs-and-authorities (Kleinberg 1999) on the DISTINCT edge
    * set: per iteration authority a ← Σ_{j→i} h_j then hub
    * h ← Σ_{i→j} a_j, each L1-normalized to Σ = 1 (scale-equivalent
    * to Kleinberg's L2 form — the ranking and ratios converge to the
    * same principal eigenvectors of AᵀA / AAᵀ, and L1 keeps the
    * normalizer a plain 1-row sum both engines reproduce exactly).
    *
    * Scale shape: state is one (node, score) row per node; each
    * half-iteration is one edge⋈state shuffle + a hash aggregate +
    * a broadcast 1-row normalizer; `localCheckpoint` lineage cuts
    * per round (the [[personalizedPageRank]] idiom).
    */
  def hits(edges: DataFrame, iters: Int = 10, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, "hits needs at least one iteration")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    var hub = nodes.select(col("node"), lit(1.0).as("h"))
    var auth = nodes.select(col("node"), lit(0.0).as("a"))
    for (_ <- 1 to iters) {
      val aRaw = e.join(hub.select(col("node").as("src"), col("h")), "src")
        .groupBy(col("dst").as("node")).agg(sum("h").as("a"))
      val aFull = nodes.join(aRaw, Seq("node"), "left")
        .select(col("node"), coalesce(col("a"), lit(0.0)).as("a"))
      auth = aFull.crossJoin(broadcast(aFull.agg(sum("a").as("s"))))
        .select(col("node"), (col("a") / col("s")).as("a"))
        .localCheckpoint()
      val hRaw = e.join(auth.select(col("node").as("dst"), col("a")), "dst")
        .groupBy(col("src").as("node")).agg(sum("a").as("h"))
      val hFull = nodes.join(hRaw, Seq("node"), "left")
        .select(col("node"), coalesce(col("h"), lit(0.0)).as("h"))
      hub = hFull.crossJoin(broadcast(hFull.agg(sum("h").as("s"))))
        .select(col("node"), (col("h") / col("s")).as("h"))
        .localCheckpoint()
    }
    nodes.join(auth, Seq("node")).join(hub, Seq("node"))
      .select(col("node"), col("a").as("authority"), col("h").as("hub"))
  }

  /** Newman–Girvan modularity of a node partition:
    * Q = Σ_c (e_c/m − (d_c/2m)²) where e_c = intra-community edges,
    * d_c = total degree held by community c, m = |edges| — the
    * objective every community-detection method optimizes, exposed as
    * the EVALUATION half so any partition (label propagation,
    * components, a hand-made segment key) can be scored. Q ≈ 0 means
    * the partition explains no more structure than a random graph
    * with the same degrees; dense well-separated communities push Q
    * toward 1. `assignment` is (node, community); unassigned
    * endpoints are treated as their own singleton (node-id-keyed)
    * community. Returns one row (n_edges, n_communities, modularity).
    *
    * Scale shape: canonicalize + two node-keyed joins to attach
    * endpoint communities, then one per-community aggregate
    * (e_c, d_c) and a final sum — all O(m) shuffles, the community
    * table never crosses itself.
    */
  def modularity(edges: DataFrame, assignment: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node", communityCol: String = "community")
      : DataFrame = {
    val e = canonicalEdges(edges, srcCol, dstCol)
    val asg = assignment.select(col(nodeCol).cast("long").as("n"),
      col(communityCol).cast("long").as("c"))
    val tagged = e
      .join(asg.select(col("n").as("u"), col("c").as("cu")), Seq("u"), "left")
      .join(asg.select(col("n").as("v"), col("c").as("cv")), Seq("v"), "left")
      // singleton fallback: an unassigned node is its own community,
      // keyed negatively so it can't collide with real community ids
      .select(coalesce(col("cu"), -col("u") - 1).as("cu"),
        coalesce(col("cv"), -col("v") - 1).as("cv"))
    val perC = graft.core.PipelineCaches.persistTracked(
      tagged.select(explode(array(col("cu"), col("cv"))).as("c"),
          (col("cu") === col("cv")).cast("int").as("intra"))
        .groupBy("c")
        // each edge contributes 1 degree to both endpoints' communities;
        // an intra edge is seen twice here, so halve its count
        .agg(count(lit(1)).as("dc"), (sum("intra") / 2).as("ec")))
    perC
      .agg((sum("dc") / 2).cast("long").as("n_edges"),
        count(lit(1)).as("n_communities"),
        sum("dc").as("two_m"), sum("ec").as("ec_tot"),
        sum(col("dc").cast("double") * col("dc")).as("dc_sq"))
      .select(col("n_edges"), col("n_communities"),
        (col("ec_tot").cast("double") / col("n_edges") -
          col("dc_sq") / (col("two_m").cast("double") * col("two_m")))
          .as("modularity"))
  }

  /** Degree assortativity coefficient (Newman 2002): the Pearson
    * correlation of endpoint degrees over every edge, each undirected
    * edge contributing both orientations so the statistic is
    * symmetric. Positive = hubs attach to hubs (social-graph shape),
    * negative = hubs attach to leaves (star/infrastructure shape) —
    * the one-number summary behind "is this graph skew-join-shaped".
    * Returns a single row (n_edges, assortativity); NULL
    * assortativity for degree-regular graphs (zero variance).
    *
    * Scale shape: canonicalize + one degree aggregate, two node-keyed
    * joins to attach endpoint degrees, one global `corr` — every
    * shuffle is O(m) rows and the final aggregate is a 6-number
    * partial (count/sums/products), never a collected edge list.
    */
  def degreeAssortativity(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = canonicalEdges(edges, srcCol, dstCol)
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val both = e.select(col("u").as("a"), col("v").as("b"))
      .unionAll(e.select(col("v").as("a"), col("u").as("b")))
    both
      .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
      .agg((count(lit(1)) / 2).cast("long").as("n_edges"),
        corr(col("da").cast("double"), col("db").cast("double"))
          .as("assortativity"))
  }

  /** Link prediction over 2-hop candidate pairs: common-neighbor
    * count, Jaccard (cn / (da + db − cn)), and Adamic–Adar
    * (Σ_w 1/ln deg(w)) for every unordered non-adjacent pair sharing
    * at least `minCommon` neighbors — the classic
    * who-should-be-connected scores (recommendation, record linkage,
    * crawl frontier ranking). Already-adjacent pairs are excluded
    * (they're edges, not predictions).
    *
    * Scale shape: one center-keyed aggregate builds each shared
    * neighbor's sorted endpoint array (for the undirected adjacency
    * the array length IS the center's degree, so the hub cap and the
    * Adamic–Adar 1/ln(deg) weight come for free — no degree join on
    * the wedge path), wedge pairs are enumerated inside whole-stage
    * codegen ([[org.apache.spark.sql.graft.PackedPairs]]) straight
    * into the pair aggregate's partial, and that aggregate — the
    * wedge-volume whale (r11 metrics: ~17 M wedge rows at sf0.1 with
    * near-zero map-side collapse) — keys on ONE packed long instead
    * of a two-column struct. The pair table stays packed through the
    * single-long-key anti-join against the packed edge set and only
    * unpacks for the two (node-sized, broadcastable) degree joins.
    * Shuffles: one degree aggregate, one adjacency group-by, one pair
    * aggregate, one anti-join — all O(wedges), never all-pairs; the
    * old form's TWO wedge self-join exchanges (the centers subtree
    * was planned twice, once per join side) are gone.
    *
    * `packedIds = true` (default) requires node ids < 2³¹ (fails
    * loudly otherwise); set false for wider id spaces — same plan
    * shape with struct pairs and a two-column aggregate key.
    */
  def linkPrediction(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxDegree: Int = 1000,
      minCommon: Int = 1, packedIds: Boolean = true): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2, got $maxDegree")
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    val e = persistTracked(canonicalEdges(edges, srcCol, dstCol))
    val adj = e.select(col("u").as("node"), col("v").as("nbr"))
      .unionAll(e.select(col("v").as("node"), col("u").as("nbr")))
    val deg = persistTracked(
      adj.groupBy("node").agg(count(lit(1)).as("degree")))
    // wedge centers: the center's sorted endpoint array. Both
    // orientations of every edge are in `adj`, so |{x : (x,w)}| =
    // |{x : (w,x)}| = deg(w) — size(xs) is the center's true degree.
    val centers = adj.groupBy(col("nbr").as("w"))
      .agg(sort_array(collect_list(col("node"))).as("xs"))
      .filter(size(col("xs")) <= maxDegree)
      .select(col("xs"),
        (lit(1.0) / log(size(col("xs")).cast("double"))).as("aa_w"))
    val pairs =
      if (packedIds)
        centers
          .select(col("aa_w"),
            explode(org.apache.spark.sql.graft.PairFunctions
              .packed_pairs(col("xs"))).as("pk"))
          .groupBy("pk")
          .agg(count(lit(1)).as("common_neighbors"),
            sum("aa_w").as("adamic_adar"))
          .filter(col("common_neighbors") >= minCommon)
          // packed anti-join: one 8-byte key against the packed edge
          // set (u < v == a < b, both canonical). The edge side packs
          // OUTSIDE packed_pairs, so it needs its own loud range check
          // (ADVICE r11): an id >= 2³¹ whose neighbors are all above
          // maxDegree never reaches packed_pairs' guard, and its
          // corrupted edge key could collide with a legit wedge key
          // and silently anti-join away a valid prediction. u < v
          // (canonical), so u < 0 and v > max cover both bounds.
          .join(e.select(
              when(col("u") < 0L || col("v") > 0x7FFFFFFFL,
                raise_error(concat(
                  lit("linkPrediction: edge ("), col("u").cast("string"),
                  lit(","), col("v").cast("string"),
                  lit(") outside [0, 2^31) — pass packedIds=false"))))
                .otherwise(shiftleft(col("u"), 32)
                  .bitwiseOR(col("v"))).as("pk")),
            Seq("pk"), "left_anti")
          .select(shiftrightunsigned(col("pk"), 32).as("a"),
            col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("b"),
            col("common_neighbors"), col("adamic_adar"))
      else
        centers
          .select(col("aa_w"), explode(flatten(transform(col("xs"),
            (x, i) => transform(
              slice(col("xs"), i + lit(2), size(col("xs"))),
              y => struct(x.as("a"), y.as("b")))))).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"), col("aa_w"))
          .groupBy("a", "b")
          .agg(count(lit(1)).as("common_neighbors"),
            sum("aa_w").as("adamic_adar"))
          .filter(col("common_neighbors") >= minCommon)
          .join(e.select(col("u").as("a"), col("v").as("b")),
            Seq("a", "b"), "left_anti")
    pairs
      .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
      .withColumn("jaccard", col("common_neighbors").cast("double") /
        (col("da") + col("db") - col("common_neighbors")))
      .select("a", "b", "common_neighbors", "jaccard", "adamic_adar")
  }

  private def persistTracked(df: DataFrame): DataFrame =
    graft.core.PipelineCaches.persistTracked(df)

  /** Power-law tail exponent of the degree distribution by the Hill
    * / discrete-MLE estimator (Clauset–Shalizi–Newman 2009 eq. 3.7):
    * α = 1 + n / Σ ln(d / (xmin − ½)) over nodes with degree ≥ xmin,
    * σ = (α − 1)/√n. The one-number scale diagnostic behind every
    * skew decision in this library — a crawl graph with α ≈ 2 says
    * "hub caps and salting are mandatory", α ≥ 3 says degrees are
    * tame. `edges` must be canonicalized distinct undirected pairs
    * (the [[triangleCounts]] input contract).
    *
    * Scale shape: one edge scan → degree hash aggregate → one 1-row
    * tail aggregate. Nothing else.
    */
  def powerLawAlpha(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", xmin: Long = 2L): DataFrame = {
    require(xmin >= 1, s"xmin must be >= 1, got $xmin")
    val und = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    deg.filter(col("degree") >= xmin)
      .agg(count(lit(1)).as("n_tail"),
        (lit(1.0) + count(lit(1)) /
          sum(log(col("degree").cast("double") / (xmin - 0.5))))
          .as("alpha"))
      .select(lit(xmin).as("xmin"), col("n_tail"), col("alpha"),
        ((col("alpha") - 1) / sqrt(col("n_tail"))).as("sigma"))
  }
  /** Directed-graph reciprocity + dyad census — how mutual a directed
    * relation is ("follows back", "links back", "replies to"):
    * n_mutual counts unordered pairs with BOTH directions, n_asym
    * pairs with exactly one, and reciprocity is the classic
    * edge-based r = 2·n_mutual / n_edges (the probability that a
    * random directed edge is reciprocated). Self-loops are dropped;
    * parallel edges collapse. Returns one row
    * (n_edges, n_pairs, n_mutual, n_asym, reciprocity).
    *
    * Scale shape: one distinct, one canonical-pair aggregate — the
    * mutual count is a (min,max)-keyed hash aggregate over the edge
    * list, never a self-join.
    */
  def reciprocity(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .filter(col("s") =!= col("d")).distinct()
    val pairs = e.select(least(col("s"), col("d")).as("a"),
        greatest(col("s"), col("d")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("dirs"))
    pairs.agg(count(lit(1)).as("n_pairs"),
        coalesce(sum("dirs"), lit(0L)).as("n_edges"),
        coalesce(sum(when(col("dirs") === 2, 1L).otherwise(0L)),
          lit(0L)).as("n_mutual"),
        coalesce(sum(when(col("dirs") === 1, 1L).otherwise(0L)),
          lit(0L)).as("n_asym"))
      .select(col("n_edges"), col("n_pairs"), col("n_mutual"),
        col("n_asym"),
        (lit(2.0) * col("n_mutual") / col("n_edges"))
          .as("reciprocity"))
  }
}
