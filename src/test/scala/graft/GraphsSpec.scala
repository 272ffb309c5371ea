package graft

import org.apache.spark.sql.functions._
import graft.graph.Graphs

/** Degree-oriented triangle counting vs brute-force enumeration. */
class GraphsSpec extends SparkSpec {

  test("triangleCounts: K4 plus a pendant — known counts and coefficients") {
    import spark.implicits._
    // K4 on {1,2,3,4} (every node in 3 triangles, cc = 1.0) plus
    // pendant 5-1 (node 1 gains a degree but no triangle); edges fed
    // unordered with duplicates and a self-loop to exercise
    // canonicalization
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L), (5L, 1L), (3L, 3L)).toDF("src", "dst")
    val got = Graphs.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) == ((4L, 3L, 0.5)))          // 3 of C(4,2)=6 pairs close
    assert(got(2L) == ((3L, 3L, 1.0)))
    assert(got(3L) == ((3L, 3L, 1.0)))
    assert(got(4L) == ((3L, 3L, 1.0)))
    assert(got(5L) == ((1L, 0L, 0.0)))          // degree < 2 -> 0.0
    val sum = Graphs.triangleSummary(edges).head()
    assert(sum.getAs[Long]("n_triangles") == 4L)
    assert(sum.getAs[Long]("n_nodes") == 5L)
    assert(sum.getAs[Long]("n_edges") == 7L)
    // transitivity: 3*4=12 closed wedges over 4*3+3*2*3+1*0... =
    // sum deg(deg-1) = 12+6+6+6+0 = 30 wedges*2 -> 12*2/30? formula:
    // 2*sum(tri)/sum(deg*(deg-1)) = 2*12/30 = 0.8
    assert(math.abs(sum.getAs[Double]("global_clustering") - 0.8) < 1e-12)
  }

  test("harmonicCentrality: landmark sweeps on a path graph") {
    import spark.implicits._
    // path 1-2-3-4, landmarks {1, 4}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val lms = Seq(1L, 4L).toDF("node")
    val got = Graphs.harmonicCentrality(edges, lms, maxHops = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // H(1) = 1/d(4,1) = 1/3 (own-landmark d=0 excluded); ends mirror
    assert(got(1L)._1 == 1L && math.abs(got(1L)._2 - 1.0 / 3) < 1e-12)
    assert(got(4L)._1 == 1L && math.abs(got(4L)._2 - 1.0 / 3) < 1e-12)
    // H(2) = 1/1 + 1/2 = 1.5 = H(3)
    assert(got(2L) == ((2L, 1.5)) && got(3L) == ((2L, 1.5)))
    // hop cap: at maxHops=1 the far end is unreached from either
    // landmark and drops out (the harmonic 0-contribution convention)
    val capped = Graphs.harmonicCentrality(edges, lms, maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(capped == Map(2L -> 1.0, 3L -> 1.0))
    // landmarkDistances carries per-landmark labels, not a min over
    // the source SET like shortestHops
    val d = Graphs.landmarkDistances(edges, lms, maxHops = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(d((1L, 4L)) == 3L && d((4L, 1L)) == 3L && d((1L, 1L)) == 0L)
    // over-cap landmark set fails loudly before k x n state builds
    val e = intercept[IllegalArgumentException] {
      Graphs.harmonicCentrality(edges, lms, maxHops = 1, maxLandmarks = 1)
    }
    assert(e.getMessage.contains("landmarks"))
  }

  test("shortestHops: multi-source BFS distances on a known graph") {
    import spark.implicits._
    // path 1-2-3-4-5 plus a separate component {10,11} and an
    // unreachable node pair {20,21}; sources = {1, 10}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (20L, 21L)).toDF("src", "dst")
    val srcs = Seq(1L, 10L).toDF("node")
    val got = Graphs.shortestHops(edges, srcs, maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L,
      10L -> 0L, 11L -> 1L), s"got $got")
  }

  test("shortestHops honors maxHops and picks the minimum over sources") {
    import spark.implicits._
    // cycle 1-2-3-4-5-6-1: sources {1, 4} → every node within 1 hop
    // of one of them except none beyond; node 2: min(1 from 1, 2 from
    // 4) = 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 1L)).toDF("src", "dst")
    val srcs = Seq(1L, 4L).toDF("node")
    val got = Graphs.shortestHops(edges, srcs, maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L,
      5L -> 1L, 6L -> 1L), s"got $got")
    // maxHops = 1 on the path graph: only source + direct neighbors
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val capped = Graphs.shortestHops(path, Seq(1L).toDF("node"),
      maxHops = 1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == Map(1L -> 0L, 2L -> 1L), s"got $capped")
    // maxHops = 0: sources only
    val zero = Graphs.shortestHops(path, Seq(1L).toDF("node"),
      maxHops = 0).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(zero == Map(1L -> 0L), s"got $zero")
  }

  test("triangleCounts equals brute force on random graphs incl. a hub") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // G(60, 0.12) plus a hub node 99 wired to 30 nodes — the skew
    // case degree orientation exists for
    val base = for {
      i <- 0 until 60; j <- (i + 1) until 60
      if rnd.nextDouble() < 0.12
    } yield (i.toLong, j.toLong)
    val hub = (0 until 30).map(i => (99L, (i * 2).toLong))
    val all = base ++ hub
    val got = Graphs.triangleCounts(all.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // brute force
    val adj = all.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keySet.toSeq.sorted
    val triOf = nodes.map { n =>
      val nb = adj(n).toSeq
      n -> (for {
        i <- nb.indices.iterator; j <- (i + 1) until nb.length
        if adj(nb(i)).contains(nb(j))
      } yield 1).sum.toLong
    }.toMap
    assert(got.keySet == nodes.toSet)
    nodes.foreach { n =>
      assert(got(n)._1 == adj(n).size.toLong, s"degree of $n")
      assert(got(n)._2 == triOf(n), s"triangles of $n")
    }
  }

  test("kCore and coreNumbers match brute-force peeling") {
    import spark.implicits._
    // brute-force core numbers by repeated peeling
    def bruteCores(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
      val nodes = und.map(_._1).toSet
      var core = Map.empty[Long, Long]
      var k = 1L
      var alive = nodes
      var aliveEdges = und
      while (alive.nonEmpty) {
        var changed = true
        while (changed) {
          val deg = aliveEdges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
          val drop = alive.filter(n => deg.getOrElse(n, 0L) < k)
          changed = drop.nonEmpty
          if (changed) {
            drop.foreach(n => core += n -> (k - 1))
            alive --= drop
            aliveEdges = aliveEdges.filter(e =>
              alive(e._1) && alive(e._2))
          }
        }
        k += 1
      }
      core
    }
    val rnd = new scala.util.Random(5)
    // random graph + a planted K5 clique (core 4) + a hub
    val base = (for {
      i <- 0 until 40; j <- (i + 1) until 40
      if rnd.nextDouble() < 0.08
    } yield (i.toLong, j.toLong)) ++
      (for (i <- 100 until 105; j <- (i + 1) until 105)
        yield (i.toLong, j.toLong)) ++
      (0 until 20).map(i => (99L, i.toLong))
    val expect = bruteCores(base)
    val gotCores = Graphs.coreNumbers(base.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotCores == expect,
      s"diff: ${gotCores.toSet.diff(expect.toSet)} / ${expect.toSet.diff(gotCores.toSet)}")
    // the planted clique is exactly the 4-core's densest part
    assert((100L until 105L).forall(gotCores(_) == 4L))
    // kCore(k) membership == nodes with core number >= k, for every
    // realized k, with all in-core degrees >= k
    (1L to expect.values.max).foreach { k =>
      val got = Graphs.kCore(base.toDF("src", "dst"), k.toInt).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.keySet == expect.filter(_._2 >= k).keySet, s"k=$k")
      assert(got.values.forall(_ >= k), s"k=$k degrees")
    }
    // a k beyond the degeneracy yields an empty core
    assert(Graphs.kCore(base.toDF("src", "dst"),
      (expect.values.max + 1).toInt).isEmpty)
    intercept[IllegalArgumentException](
      Graphs.kCore(base.toDF("src", "dst"), 0))
  }

  test("personalizedPageRank equals a dense driver replay; mass conserved") {
    import spark.implicits._
    // directed graph with a dangling node (4) and an off-seed island
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 10L)).toDF("src", "dst")
    val seeds = Seq((0L, 2.0), (1L, 1.0)).toDF("node", "weight")
    val alpha = 0.2
    val iters = 15
    val got = Graphs.personalizedPageRank(edges, seeds, alpha, iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // dense replay
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 10L, 11L)
    val idx = ids.zipWithIndex.toMap
    val out = Map(0 -> Seq(1), 1 -> Seq(2), 2 -> Seq(0, 3), 3 -> Seq(4),
      4 -> Seq.empty[Int], 5 -> Seq(6), 6 -> Seq(5))
    val restart = Array(2.0 / 3, 1.0 / 3, 0, 0, 0, 0, 0)
    var r = restart.clone()
    for (_ <- 1 to iters) {
      val next = new Array[Double](ids.size)
      var fwd = 0.0
      for (j <- ids.indices; if out(j).nonEmpty) {
        fwd += r(j)
        out(j).foreach(d => next(d) += r(j) / out(j).size)
      }
      val dangling = 1.0 - fwd
      r = Array.tabulate(ids.size)(j =>
        alpha * restart(j) + (1 - alpha) * (next(j) + dangling * restart(j)))
    }
    for ((id, j) <- idx)
      assert(math.abs(got(id) - r(j)) < 1e-12, s"node $id: ${got(id)} vs ${r(j)}")
    assert(math.abs(got.values.sum - 1.0) < 1e-12, "mass must be conserved")
    // the disconnected island gets NO personalized mass
    assert(got(10L) == 0.0 && got(11L) == 0.0)
    assert(got(0L) > got(3L), "seed outranks downstream nodes")
  }

  test("kTruss peels to the planted dense kernel") {
    import spark.implicits._
    // K4 on {1..4} + pendant path 4-5-6 (+ dup edge and self-loop for
    // canonicalization): the path edges have support 0 and peel off;
    // K4 is a 4-truss (every edge in 2 triangles)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (2L, 1L), (3L, 3L)).toDF("src", "dst")
    def run(k: Int) = Graphs.kTruss(edges, k).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val t3 = run(3)
    val k4edges = Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    assert(t3.keySet == k4edges, s"got ${t3.keySet}")
    assert(t3.values.forall(_ == 2L)) // each K4 edge closes 2 triangles
    assert(run(4).keySet == k4edges)  // K4 is a 4-truss
    assert(run(5).isEmpty)            // ...but not a 5-truss
    // 2-truss = whole canonical graph, supports included
    val t2 = run(2)
    assert(t2.keySet == k4edges ++ Set((4L, 5L), (5L, 6L)))
    assert(t2((4L, 5L)) == 0L && t2((5L, 6L)) == 0L)
    intercept[IllegalArgumentException](Graphs.kTruss(edges, k = 1))
  }

  test("hits equals a dense driver replay and ranks the planted hub/authority") {
    import spark.implicits._
    // 1 and 2 point at 3 and 4; 3 also points at 4 → 4 is the top
    // authority, 1/2/3 are hubs; 5→1 adds a weak hub and makes 1 a
    // minor authority. Duplicate edge exercises the distinct().
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 1L), (1L, 3L)).toDF("src", "dst")
    val iters = 10
    val nodes = Seq(1L, 2L, 3L, 4L, 5L)
    val adj = Set((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (5L, 1L))
    var h = nodes.map(_ -> 1.0).toMap
    var a = nodes.map(_ -> 0.0).toMap
    for (_ <- 1 to iters) {
      val ar = nodes.map(n =>
        n -> adj.filter(_._2 == n).toSeq.map(e => h(e._1)).sum).toMap
      val as = ar.values.sum
      a = ar.map { case (k, v) => k -> v / as }
      val hr = nodes.map(n =>
        n -> adj.filter(_._1 == n).toSeq.map(e => a(e._2)).sum).toMap
      val hs = hr.values.sum
      h = hr.map { case (k, v) => k -> v / hs }
    }
    val got = Graphs.hits(edges, iters).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    nodes.foreach { n =>
      assert(math.abs(got(n)._1 - a(n)) < 1e-9, s"authority $n")
      assert(math.abs(got(n)._2 - h(n)) < 1e-9, s"hub $n")
    }
    // structure: 4 is the top authority; 5 has zero authority
    assert(nodes.forall(n => got(4L)._1 >= got(n)._1))
    assert(got(5L)._1 == 0.0)
    intercept[IllegalArgumentException](Graphs.hits(edges, iters = 0))
  }

  test("labelPropagation: planted dense clusters split across a bridge") {
    import spark.implicits._
    // two K5 cliques {0..4} and {10..14} joined by ONE bridge 4-10 —
    // LPA must keep them as two communities (the bridge vote loses to
    // 4 in-clique votes); fed unordered with duplicates
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(0L to 4L) ++ clique(10L to 14L) :+ ((4L, 10L)) :+ ((10L, 4L)))
      .toDF("src", "dst")
    val got = Graphs.labelPropagation(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 10)
    val c1 = (0L to 4L).map(got).toSet
    val c2 = (10L to 14L).map(got).toSet
    assert(c1.size == 1 && c2.size == 1, s"cliques must be uniform: $got")
    assert(c1 != c2, "bridge must not merge the cliques")
    assert(c1.head == 0L && c2.head == 10L,
      "community id is the minimum member id")
    // determinism: a second run is identical
    val again = Graphs.labelPropagation(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("labelPropagation: a connected component can split, components cannot merge") {
    import spark.implicits._
    // path graph 1-2-3-4-5-6 plus an isolated edge 20-21: every LPA
    // community is a subset of a connected component
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (20L, 21L)).toDF("src", "dst")
    val got = Graphs.labelPropagation(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(20L) == got(21L))
    val pathC = (1L to 6L).map(got).toSet
    assert(!pathC.contains(got(20L)),
      "separate components must never share a community")
  }

  test("modularity: planted communities, trivial partition, singleton fallback") {
    import spark.implicits._
    // two disjoint triangles, perfectly partitioned: m = 6,
    // per community e_c = 3, d_c = 6 -> Q = 2*(3/6 - (6/12)^2) = 0.5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("src", "dst")
    val good = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("node", "community")
    val g = Graphs.modularity(edges, good).head()
    assert(g.getLong(0) == 6L && g.getLong(1) == 2L)
    assert(math.abs(g.getDouble(2) - 0.5) < 1e-12)
    // everything in one community: Q = 1 - 1 = 0
    val one = (1L to 6L).map(n => (n, 0L)).toDF("node", "community")
    assert(math.abs(Graphs.modularity(edges, one).head().getDouble(2))
      < 1e-12)
    // empty assignment -> every node a singleton: e_c = 0,
    // Q = -sum(d_c^2)/(2m)^2 = -6*4/144 = -1/6
    val s0 = Graphs.modularity(edges,
      Seq.empty[(Long, Long)].toDF("node", "community")).head()
    assert(s0.getLong(1) == 6L)
    assert(math.abs(s0.getDouble(2) - (-1.0 / 6)) < 1e-12)
  }

  test("degreeAssortativity: star is -1, regular graph has no variance") {
    import spark.implicits._
    // star K1,4: every edge connects degree 4 to degree 1 -> r = -1
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("src", "dst")
    val rs = Graphs.degreeAssortativity(star).head()
    assert(rs.getLong(0) == 4L)
    assert(math.abs(rs.getDouble(1) - (-1.0)) < 1e-12)
    // 4-cycle: all degrees 2 -> zero variance -> NULL coefficient
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val rc = Graphs.degreeAssortativity(cycle).head()
    assert(rc.getLong(0) == 4L && rc.isNullAt(1))
    // brute-force Pearson on a small irregular graph (path + chord)
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L)).toDF("src", "dst")
    val deg = Map(1L -> 1, 2L -> 3, 3L -> 2, 4L -> 2)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L))
      .flatMap { case (u, v) => Seq((deg(u), deg(v)), (deg(v), deg(u))) }
    val n = pairs.size.toDouble
    val (sx, sy) = (pairs.map(_._1).sum.toDouble, pairs.map(_._2).sum.toDouble)
    val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
    val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
    val syy = pairs.map(p => p._2 * p._2).sum.toDouble
    val expected = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val rg = Graphs.degreeAssortativity(g).head()
    assert(math.abs(rg.getDouble(1) - expected) < 1e-12, rg.getDouble(1))
  }

  test("linkPrediction: hand-computed CN/Jaccard/AA, adjacency excluded, hub cap") {
    import spark.implicits._
    // path-ish graph: 1-3, 2-3, 1-4, 2-4, 1-2  ->  candidate (3,4)
    // shares {1,2}; (1,2) shares {3,4} but IS an edge -> excluded
    val g = Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (1L, 2L))
      .toDF("src", "dst")
    val got = Graphs.linkPrediction(g, minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // deg: 1->3, 2->3, 3->2, 4->2
    val (cn, jac, aa) = got((3L, 4L))
    assert(cn == 2L)
    assert(math.abs(jac - 2.0 / (2 + 2 - 2)) < 1e-12)
    assert(math.abs(aa - 2.0 / math.log(3.0)) < 1e-12)
    assert(!got.contains((1L, 2L)), "existing edge must be excluded")
    // hub cap: with maxDegree = 2 nodes 1 and 2 (deg 3) are not wedge
    // centers anymore -> (3,4) loses both its wedges
    val capped = Graphs.linkPrediction(g, maxDegree = 2, minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.contains((3L, 4L)))
  }
}
