package graft

import graft.agg.{Histogram, Hll}
import graft.matrix.Combinatorics
import graft.typed.TypedPipe
import scala.collection.immutable.SortedMap

/** HLL sketch accuracy/merging, client-side histogram stats,
  * combinatorics counts, resource lifecycle.
  */
class ExtrasSpec extends SparkSpec {

  test("HLL estimates within rsd and merges like a set union") {
    val a = (1 to 5000).map("a" + _).foldLeft(Hll.empty(12))((h, s) => h.add(Hll.hash(s)))
    val b = (2500 to 7500).map("a" + _).foldLeft(Hll.empty(12))((h, s) => h.add(Hll.hash(s)))
    assert(math.abs(a.estimate - 5000) < 5000 * 0.05)
    val merged = a.merge(b)
    assert(math.abs(merged.estimate - 7500) < 7500 * 0.05)
    // idempotent merge
    assert(merged.merge(merged).estimate == merged.estimate)
  }

  test("HLL intersection estimate tracks true overlap and clamps at zero") {
    def sketch(keys: Seq[String]): Hll =
      keys.foldLeft(Hll.empty(12))((h, s) => h.add(Hll.hash(s)))
    val a = sketch((0 until 2000).map(i => s"k$i"))
    val b = sketch((1000 until 3000).map(i => s"k$i")) // true overlap 1000
    val est = a.intersectionEstimate(b)
    assert(math.abs(est - 1000) <= 150, s"overlap estimate off: $est")
    // near-disjoint sets: estimate must clamp at >= 0 and stay small
    val c = sketch((50000 until 51000).map(i => s"k$i"))
    val dis = a.intersectionEstimate(c)
    assert(dis >= 0 && dis <= 200, s"disjoint estimate off: $dis")
  }

  test("HLL pForError matches the rsd relation") {
    assert(Hll.pForError(0.01) >= 13) // 1% needs ~2^13.4 registers
    assert(Hll.pForError(0.05) <= 10)
  }

  test("histogram client-side stats") {
    val h = Histogram(10.0, Seq((0.0, 5L), (10.0, 3L), (20.0, 2L)))
    assert(h.total == 10L)
    assert(h.median == 0.0) // 5 of 10 at bin 0
    assert(h.percentile(0.8) == 10.0)
    assert(h.percentile(1.0) == 20.0)
    assert(math.abs(h.mean - 7.0) < 1e-12)
    assert(h.cdf.last._2 == 1.0)
  }

  test("combinations and permutations counts") {
    assert(Combinatorics.combinations(spark, 6, 3).count() == 20)
    assert(Combinatorics.permutations(spark, 5, 2).count() == 20)
    val ws = Combinatorics.weightedSum(spark, Seq(2L, 3L), 12L).collect()
    // 2x + 3y = 12: (0,4), (3,2), (6,0)
    assert(ws.length == 3)
    assert(Combinatorics.positiveWeightedSum(spark, Seq(2L, 3L), 12L).count() == 1)
  }

  test("usingMap opens one resource per partition and releases it") {
    import spark.implicits._
    val opened = spark.sparkContext.longAccumulator("opened")
    val released = spark.sparkContext.longAccumulator("released")
    val out = TypedPipe.from(spark, (1 to 100).toSeq)
      .thenDo(p => new TypedPipe(p.ds.repartition(4)))
      .usingMap(() => { opened.add(1); new Object },
        (_: Object) => released.add(1))((_, x) => x * 2)
      .ds.collect()
    assert(out.sorted.toSeq == (2 to 200 by 2))
    assert(opened.value == 4L)
    assert(released.value == 4L)
  }

  test("usingMap releases resources when the consumer stops early (limit)") {
    import spark.implicits._
    val opened = spark.sparkContext.longAccumulator("opened2")
    val released = spark.sparkContext.longAccumulator("released2")
    val out = TypedPipe.from(spark, (1 to 1000).toSeq)
      .thenDo(p => new TypedPipe(p.ds.repartition(4)))
      .usingMap(() => { opened.add(1); new Object },
        (_: Object) => released.add(1))((_, x) => x)
      .ds.limit(5).collect()
    assert(out.length == 5)
    // limit short-circuits the iterator mid-partition; the
    // task-completion listener must still release every opened resource
    assert(opened.value > 0L)
    assert(released.value == opened.value,
      s"leaked ${opened.value - released.value} resources")
  }

  test("hashSample is deterministic, append-stable, and roughly proportional") {
    import spark.implicits._
    val df = (1L to 10000L).toDF("id")
    val a = graft.ml.Profile.hashSample(df, "id", 0.2).collect().map(_.getLong(0)).toSet
    val b = graft.ml.Profile.hashSample(df, "id", 0.2).collect().map(_.getLong(0)).toSet
    assert(a == b, "re-run must select identical keys")
    assert(math.abs(a.size - 2000) < 300, s"fraction off: ${a.size}")
    // membership is stable under appends: the sample of a prefix is a
    // subset of the sample of the whole
    val prefix = graft.ml.Profile.hashSample((1L to 5000L).toDF("id"), "id", 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(prefix.subsetOf(a))
    // nested fraction: a 10% sample is a subset of the 20% sample
    val tighter = graft.ml.Profile.hashSample(df, "id", 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(tighter.subsetOf(a))
  }

  test("strong hash sample stays proportional on adversarial key structure") {
    import spark.implicits._
    val df = (1L to 10000L).toDF("id")
    val a = graft.ml.Profile.hashSampleStrong(df, "id", 0.2)
      .collect().map(_.getLong(0)).toSet
    val b = graft.ml.Profile.hashSampleStrong(df, "id", 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "re-run must select identical keys")
    assert(math.abs(a.size - 2000) < 300, s"fraction off: ${a.size}")
    val tighter = graft.ml.Profile.hashSampleStrong(df, "id", 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(tighter.subsetOf(a), "nested fractions must be subsets")
    // adversarial keys: multiples of M = 2^31-1 all collide to 0 under
    // the Fibonacci scramble (every one selected at any fraction); the
    // crypto sampler keeps the fraction honest
    val adv = (1L to 2000L).map(_ * 2147483647L).toDF("id")
    val fib = graft.ml.Profile.hashSample(adv, "id", 0.1).count()
    val strong = graft.ml.Profile.hashSampleStrong(adv, "id", 0.1).count()
    assert(fib == 2000L, s"fib scramble should degenerate here, got $fib")
    assert(math.abs(strong - 200L) < 80, s"strong sample biased: $strong")
  }

  test("stratified hash sample applies per-stratum fractions") {
    import spark.implicits._
    val df = (1L to 6000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
    val out = graft.ml.Profile.stratifiedHashSample(df, "id", "s",
      Map("a" -> 0.5, "b" -> 0.05))
    val counts = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("a") - 1500L) < 300, s"a: ${counts("a")}")
    assert(math.abs(counts.getOrElse("b", 0L) - 150L) < 80, s"b: ${counts.getOrElse("b", 0L)}")
  }

  test("profile: approx variant stays close to exact distincts") {
    import spark.implicits._
    val df = (1L to 5000L).map(i => (i % 97, i.toDouble)).toDF("k", "v")
    val exact = graft.ml.Profile.profile(df, Seq("k", "v"), exact = true)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(exact("k") == 97L && exact("v") == 5000L)
    val approx = graft.ml.Profile.profile(df, Seq("k", "v"), exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(approx("k") - 97.0) / 97.0 < 0.1)
    assert(math.abs(approx("v") - 5000.0) / 5000.0 < 0.1)
  }

  test("madOutliers flags by the Hampel rule, brute-force checked per group") {
    import spark.implicits._
    // group a: tight cluster + two spikes; group b: constant (MAD 0)
    val a = Seq(10.0, 11.0, 12.0, 10.5, 11.5, 9.5, 100.0, -40.0).map(("a", _))
    val b = Seq(5.0, 5.0, 5.0, 7.0).map(("b", _))
    val df = (a ++ b).toDF("k", "v")
    val out = graft.ml.Profile.madOutliers(df, Seq("k"), "v", threshold = 3.5)
      .collect()
      .map(r => (r.getString(r.fieldIndex("k")), r.getDouble(r.fieldIndex("v")),
        r.getBoolean(r.fieldIndex("is_outlier"))))
    def bruteMedian(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val am = bruteMedian(a.map(_._2))
    val amad = bruteMedian(a.map(x => math.abs(x._2 - am)))
    out.filter(_._1 == "a").foreach { case (_, v, flagged) =>
      assert(flagged == (math.abs(v - am) > 3.5 * amad), s"a/$v")
    }
    // every value is annotated, not just the outliers
    assert(out.count(_._1 == "a") == a.size)
    // MAD-0 group: any deviation from the median is an outlier
    assert(out.filter(_._1 == "b").toSeq.sortBy(_._2).map(_._3).toSeq ==
      Seq(false, false, false, true))
    // approx path agrees on a clear-cut case
    val approx = graft.ml.Profile.madOutliers(df, Seq("k"), "v",
        threshold = 3.5, exact = false)
      .filter(org.apache.spark.sql.functions.col("is_outlier")).select("v")
      .collect().map(_.getDouble(0)).sorted.toSeq
    assert(approx.contains(100.0) && approx.contains(-40.0))
    intercept[IllegalArgumentException](
      graft.ml.Profile.madOutliers(df, Seq.empty, "v"))
  }

  test("driftReport: hand-computed PSI/KL/TVD, zero drift on identical data") {
    import spark.implicits._
    import graft.ml.Profile
    // baseline: 4 low + 4 high; current: 2 low + 6 high; one cut at 10
    val base = Seq(1.0, 2.0, 3.0, 4.0, 11.0, 12.0, 13.0, 14.0).toDF("v")
    val cur = Seq(1.0, 2.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0).toDF("v")
    val rows = Profile.driftReport(base, cur, "v", Seq(10.0))
      .collect().map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Double]("base_frac"), r.getAs[Double]("cur_frac"),
          r.getAs[Double]("psi_term"), r.getAs[Double]("kl_term"),
          r.getAs[Double]("tv_term"))).toMap
    // smoothed fracs: (4+0.5)/(8+1) = 0.5 both buckets baseline;
    // current (2+0.5)/9 and (6+0.5)/9
    val (b1, c1) = (4.5 / 9, 2.5 / 9)
    val (b2, c2) = (4.5 / 9, 6.5 / 9)
    assert(math.abs(rows(1L)._1 - b1) < 1e-12)
    assert(math.abs(rows(1L)._2 - c1) < 1e-12)
    assert(math.abs(rows(1L)._3 - (c1 - b1) * math.log(c1 / b1)) < 1e-12)
    assert(math.abs(rows(2L)._4 - c2 * math.log(c2 / b2)) < 1e-12)
    assert(math.abs(rows(1L)._5 - math.abs(c1 - b1) / 2) < 1e-12)
    // summary sums the terms
    val sumRow = Profile.driftSummary(base, cur, "v", Seq(10.0)).head()
    assert(math.abs(sumRow.getAs[Double]("psi") -
      (rows(1L)._3 + rows(2L)._3)) < 1e-12)
    assert(math.abs(sumRow.getAs[Double]("tvd") -
      (rows(1L)._5 + rows(2L)._5)) < 1e-12)
    // identical snapshots: every term is exactly zero
    val zero = Profile.driftSummary(base, base, "v", Seq(5.0, 10.0)).head()
    assert(zero.getAs[Double]("psi") == 0.0)
    assert(zero.getAs[Double]("kl") == 0.0)
    assert(zero.getAs[Double]("tvd") == 0.0)
    // an empty current bucket stays finite thanks to smoothing
    val allLow = Seq(1.0, 2.0, 3.0).toDF("v")
    val fin = Profile.driftSummary(base, allLow, "v", Seq(10.0)).head()
    assert(!fin.getAs[Double]("psi").isNaN && !fin.getAs[Double]("psi").isInfinite)
    intercept[IllegalArgumentException](
      Profile.driftReport(base, cur, "v", Seq(10.0, 5.0)))
    intercept[IllegalArgumentException](
      Profile.driftReport(base, cur, "v", Seq.empty))
  }

  test("ksDistance: near-exact vs brute force, 0 on identical, sensitive to shift") {
    import spark.implicits._
    import graft.ml.Profile
    val rnd = new scala.util.Random(13)
    val a = Seq.fill(4000)(rnd.nextGaussian()).toDF("v")
    val shifted = Seq.fill(4000)(rnd.nextGaussian() + 0.5).toDF("v")
    val ks = Profile.ksDistance(a, shifted, "v")
    // exact KS via full sort on the driver
    def exact(x: Seq[Double], y: Seq[Double]): Double = {
      val xs = x.sorted; val ys = y.sorted
      val grid = (xs ++ ys).distinct.sorted
      def cdf(s: Seq[Double], t: Double) = {
        var lo = 0; var hi = s.length
        while (lo < hi) {
          val m = (lo + hi) / 2
          if (s(m) <= t) lo = m + 1 else hi = m
        }
        lo.toDouble / s.length
      }
      grid.map(t => math.abs(cdf(xs, t) - cdf(ys, t))).max
    }
    val ex = exact(a.collect().map(_.getDouble(0)).toSeq,
      shifted.collect().map(_.getDouble(0)).toSeq)
    assert(math.abs(ks - ex) < 0.05, s"sketch $ks vs exact $ex")
    // the 0.5-sigma shift reads as a big distance
    assert(ks > 0.12, s"$ks")
    // identical data: exactly zero (same sketch both sides)
    assert(Profile.ksDistance(a, a, "v") == 0.0)
    intercept[IllegalArgumentException](
      Profile.ksDistance(a, Seq.empty[Double].toDF("v"), "v"))
  }

  test("overlapMatrix: exact set algebra below sketch capacity") {
    import spark.implicits._
    // A = 0..999, B = 500..1499 (|A∩B| = 500), C = 2000..2499 (disjoint)
    val rows = (0 until 1000).map(i => ("A", i.toLong)) ++
      (500 until 1500).map(i => ("B", i.toLong)) ++
      (2000 until 2500).map(i => ("C", i.toLong)) ++
      (0 until 1000).map(i => ("A", i.toLong)) // duplicates must not inflate
    val got = graft.ml.Profile
      .overlapMatrix(rows.toDF("src", "item"), "src", "item")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getDouble(7))).toMap
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    val (na, nb, ab, aOnly, bOnly, jac) = got(("A", "B"))
    assert((na, nb, ab, aOnly, bOnly) == ((1000L, 1000L, 500L, 500L, 500L)))
    assert(math.abs(jac - 500.0 / 1500.0) < 1e-12)
    val (_, _, ac, _, _, jacAc) = got(("A", "C"))
    assert(ac == 0L && jacAc == 0.0)
  }

  test("herfindahl: hand category shares per group") {
    import spark.implicits._
    val df = Seq(("g1", "a"), ("g1", "a"), ("g1", "a"), ("g1", "b"),
      ("g2", "a"), ("g2", "a"), ("g2", "b"), ("g2", "b"))
      .toDF("g", "c")
    val got = graft.ml.Profile.herfindahl(df, "g", "c").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("g1") == ((4L, 2L, (9.0 + 1.0) / 16))) // 0.625
    assert(got("g2") == ((4L, 2L, 0.5)))              // uniform pair
  }

  test("massConcentration: pro-rata tie groups, exact top-f shares") {
    import spark.implicits._
    // 10 rows: one giant (91), nine of 1 -> total 100
    val vs = (Seq(91.0) ++ Seq.fill(9)(1.0)).toDF("v")
    val got = graft.ml.Profile.massConcentration(vs, "v",
        Seq(0.1, 0.2, 0.5, 1.0))
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // top 10% = 1 row = the giant: share 0.91
    assert(got(0.1) == ((1L, 91.0, 0.91)))
    // top 20% = 2 rows: 91 + 1 (pro-rata 1 of the 9-tie group)
    assert(got(0.2) == ((2L, 92.0, 0.92)))
    assert(got(0.5) == ((5L, 95.0, 0.95)))
    assert(got(1.0) == ((10L, 100.0, 1.0)))
    intercept[IllegalArgumentException](
      graft.ml.Profile.massConcentration(vs, "v", Seq(0.0)))
  }

  test("giniConcentration: uniform = 0, one-owner -> (n-1)/n, ties exact") {
    import spark.implicits._
    val even = Seq(5.0, 5.0, 5.0, 5.0).toDF("v")
    assert(math.abs(graft.ml.Profile.giniConcentration(even, "v")
      .head().getDouble(2)) < 1e-12)
    // one owner of everything: G = (n-1)/n
    val one = Seq(0.0, 0.0, 0.0, 12.0).toDF("v")
    val g1 = graft.ml.Profile.giniConcentration(one, "v").head()
    assert(g1.getLong(0) == 4L && g1.getDouble(1) == 12.0)
    assert(math.abs(g1.getDouble(2) - 0.75) < 1e-12)
    // brute force on a mixed multiset (sorted-rank formula)
    val vs = Seq(1.0, 2.0, 2.0, 7.0)
    val sorted = vs.sorted
    val n = vs.size
    val brute = 2.0 * sorted.zipWithIndex.map {
      case (x, i) => (i + 1) * x }.sum / (n * vs.sum) - (n + 1.0) / n
    val g2 = graft.ml.Profile.giniConcentration(vs.toDF("v"), "v")
      .head().getDouble(2)
    assert(math.abs(g2 - brute) < 1e-12, s"$g2 vs $brute")
    // all-zero mass -> NULL
    assert(graft.ml.Profile.giniConcentration(
      Seq(0.0, 0.0).toDF("v"), "v").head().isNullAt(2))
  }

  test("benford: digit extraction, shares, sub-1 exclusion") {
    import spark.implicits._
    val vs = Seq(1.5, 19.0, 123.0, 2.0, 29.9, 9.01, 0.5).toDF("v")
    val got = graft.ml.Profile.benford(vs, "v").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // 0.5 excluded; digits: 1,1,1,2,2,9 over 6 rows
    assert(got.keySet == Set(1, 2, 9))
    assert(got(1)._1 == 3L && got(2)._1 == 2L && got(9)._1 == 1L)
    assert(math.abs(got(1)._2 - 0.5) < 1e-12)
    val e1 = math.log(2.0) / math.log(10.0)
    assert(math.abs(got(1)._3 - e1) < 1e-12)
    assert(math.abs(got(1)._4 - (0.5 - e1) * (0.5 - e1) / e1 * 6) < 1e-12)
  }

  test("frequentPairs: support/confidence/lift closed form + basket cap") {
    import spark.implicits._
    // 4 baskets: {a,b,c}, {a,b}, {a,c}, {d}; duplicates collapse
    val rows = Seq((1L, "a"), (1L, "b"), (1L, "c"), (1L, "a"),
      (2L, "a"), (2L, "b"), (3L, "a"), (3L, "c"), (4L, "d"))
    val got = graft.ml.Associations
      .frequentPairs(rows.toDF("b", "i"), "b", "i", minSupport = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8)))).toMap
    // pairs >= 2: (a,b) in baskets 1,2; (a,c) in 1,3; (b,c) only 1
    assert(got.keySet == Set(("a", "b"), ("a", "c")))
    val (na, nb2, nab, sup, cab, cba, lift) = got(("a", "b"))
    assert(na == 3L && nb2 == 2L && nab == 2L)
    assert(sup == 2.0 / 4 && cab == 2.0 / 3 && cba == 1.0)
    assert(math.abs(lift - 2.0 * 4 / (3 * 2)) < 1e-12)
    // capping baskets at size 2 drops basket 1 before pairing
    val capped = graft.ml.Associations
      .frequentPairs(rows.toDF("b", "i"), "b", "i", minSupport = 1L,
        maxBasketSize = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(capped == Set(("a", "b"), ("a", "c")))
    intercept[IllegalArgumentException](graft.ml.Associations
      .frequentPairs(rows.toDF("b", "i"), "b", "i", minSupport = 0L))
  }

  test("spearman: monotone = 1, reversed = -1, midranks under ties") {
    import spark.implicits._
    val mono = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 25.0), (4.0, 100.0))
    assert(math.abs(graft.ml.Profile.spearman(mono.toDF("x", "y"), "x", "y")
      .head().getDouble(1) - 1.0) < 1e-12)
    val rev = mono.map { case (x, y) => (x, -y) }
    assert(math.abs(graft.ml.Profile.spearman(rev.toDF("x", "y"), "x", "y")
      .head().getDouble(1) + 1.0) < 1e-12)
    // ties: brute-force midrank Pearson
    val tied = Seq((1.0, 5.0), (1.0, 7.0), (2.0, 7.0), (3.0, 9.0), (3.0, 2.0))
    def midranks(vs: Seq[Double]): Map[Double, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val idx = sorted.zipWithIndex.filter(_._1 == v).map(_._2 + 1)
        v -> idx.sum.toDouble / idx.size
      }.toMap
    }
    val rx = midranks(tied.map(_._1))
    val ry = midranks(tied.map(_._2))
    val pts = tied.map { case (x, y) => (rx(x), ry(y)) }
    val n = pts.size.toDouble
    val (mx, my) = (pts.map(_._1).sum / n, pts.map(_._2).sum / n)
    val cov = pts.map(p => (p._1 - mx) * (p._2 - my)).sum
    val brute = cov / math.sqrt(
      pts.map(p => (p._1 - mx) * (p._1 - mx)).sum *
        pts.map(p => (p._2 - my) * (p._2 - my)).sum)
    val got = graft.ml.Profile.spearman(tied.toDF("x", "y"), "x", "y").head()
    assert(got.getLong(0) == 5L)
    assert(math.abs(got.getDouble(1) - brute) < 1e-12,
      s"got ${got.getDouble(1)} want $brute")
    // constant column -> NULL
    assert(graft.ml.Profile.spearman(
      Seq((1.0, 1.0), (2.0, 1.0)).toDF("x", "y"), "x", "y")
      .head().isNullAt(1))
  }

  test("winsorize clips at the exact per-stratum interpolated quantiles") {
    import spark.implicits._
    // stratum a: 0..100 step 10 (11 values); p05 interpolates between
    // sorted[0.5] -> 5.0, p95 -> 95.0
    val a = (0 to 100 by 10).map(v => ("a", v.toDouble))
    val b = Seq(("b", 1.0), ("b", 2.0), ("b", 3.0))
    val out = graft.ml.Profile.winsorize((a ++ b).toDF("k", "v"), "v", "k")
      .collect()
      .map(r => (r.getString(r.fieldIndex("k")), r.getDouble(r.fieldIndex("v")),
        r.getDouble(r.fieldIndex("v_winsorized")),
        r.getBoolean(r.fieldIndex("clipped"))))
    val av = out.filter(_._1 == "a")
    assert(av.map(_._3).min == 5.0 && av.map(_._3).max == 95.0)
    // exactly the 0 and 100 endpoints clip
    assert(av.filter(_._4).map(_._2).sorted.toSeq == Seq(0.0, 100.0))
    // interior values pass through untouched
    av.filterNot(_._4).foreach { case (_, v, w, _) => assert(v == w) }
    // p05 of {1,2,3} = 1 + 0.05*2*... = sorted[0.1] -> 1.1; p95 -> 2.9
    val bv = out.filter(_._1 == "b")
    assert(bv.map(_._3).min == 1.1 && bv.map(_._3).max == 2.9)
    intercept[IllegalArgumentException](
      graft.ml.Profile.winsorize(b.toDF("k", "v"), "v", "k", 0.9, 0.1))
  }
}
