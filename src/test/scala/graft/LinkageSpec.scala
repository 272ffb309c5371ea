package graft

import org.apache.spark.sql.functions._
import graft.ml.Linkage

/** Fellegi–Sunter linkage: EM recovers planted parameters, scoring
  * separates matches, decisions honor the thresholds.
  */
class LinkageSpec extends SparkSpec {

  test("EM matches a driver-side replay and recovers planted structure") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    // planted generative model: 30% matches with P(agree)=0.95 per
    // field, non-matches with P(agree)=0.2 / 0.1 / 0.3
    val mTrue = Array(0.95, 0.95, 0.95)
    val uTrue = Array(0.2, 0.1, 0.3)
    val rows = (0 until 2000).map { i =>
      val isM = rnd.nextDouble() < 0.3
      val ps = if (isM) mTrue else uTrue
      (i.toLong, isM, rnd.nextDouble() < ps(0), rnd.nextDouble() < ps(1),
        rnd.nextDouble() < ps(2))
    }
    val df = rows.toDF("id", "truth", "g1", "g2", "g3")
    val gs = Seq("g1", "g2", "g3")
    val got = Linkage.emTrain(df, gs, iters = 20)

    // driver replay of the identical EM
    var p = 0.1
    var m = Array.fill(3)(0.9)
    var u = Array.fill(3)(0.1)
    def cl(x: Double) = math.min(1 - 1e-6, math.max(1e-6, x))
    for (_ <- 0 until 20) {
      val gvals = rows.map { case (_, _, a, b, c) =>
        val gamma = Seq(a, b, c)
        val w = gamma.zip(m).map { case (g, mj) => if (g) mj else 1 - mj }
          .product * p
        val v = gamma.zip(u).map { case (g, uj) => if (g) uj else 1 - uj }
          .product * (1 - p)
        (gamma, w / (w + v))
      }
      val sg = gvals.map(_._2).sum
      val sn = gvals.map(1.0 - _._2).sum
      p = cl(sg / rows.size)
      m = Array.tabulate(3)(k =>
        cl(gvals.filter(_._1(k)).map(_._2).sum / sg))
      u = Array.tabulate(3)(k =>
        cl(gvals.filter(_._1(k)).map(1.0 - _._2).sum / sn))
    }
    assert(math.abs(got.p - p) < 1e-9)
    (0 until 3).foreach { k =>
      assert(math.abs(got.m(k) - m(k)) < 1e-9, s"m($k)")
      assert(math.abs(got.u(k) - u(k)) < 1e-9, s"u($k)")
    }
    // EM recovered the planted regime (match prior ~0.3, m >> u)
    assert(math.abs(got.p - 0.3) < 0.08, s"p=${got.p}")
    (0 until 3).foreach(k => assert(got.m(k) > 0.8 && got.u(k) < 0.45))

    // scoring separates: mean posterior of true matches >> non-matches
    val scored = Linkage.score(df, gs, got)
    val byTruth = scored.groupBy("truth").agg(avg("posterior").as("ap"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byTruth(true) > 0.75 && byTruth(false) < 0.3, s"$byTruth")

    // decisions: boundaries respected
    val dec = Linkage.classify(scored, upper = 2.0, lower = -2.0)
    val bad = dec.filter(
      (col("decision") === "match" && col("match_weight") < 2.0) ||
        (col("decision") === "non_match" && col("match_weight") >= -2.0) ||
        (col("decision") === "possible" &&
          (col("match_weight") >= 2.0 || col("match_weight") < -2.0)))
    assert(bad.isEmpty)
    intercept[IllegalArgumentException](Linkage.emTrain(df, Seq.empty))
    intercept[IllegalArgumentException](
      Linkage.classify(scored, upper = 0.0, lower = 1.0))
  }

  test("EM on an empty candidate set keeps the initial parameters") {
    import spark.implicits._
    val empty = Seq.empty[(Boolean, Boolean)].toDF("g1", "g2")
    val got = Linkage.emTrain(empty, Seq("g1", "g2"), iters = 3)
    assert(got.p == 0.1)
    assert(got.m.toSeq == Seq(0.9, 0.9) && got.u.toSeq == Seq(0.1, 0.1))
    assert(!got.p.isNaN)
  }

  test("jaro_winkler matches DuckDB's jaro_winkler_similarity bit-for-bit") {
    import spark.implicits._
    // fixture values produced by DuckDB jaro_winkler_similarity —
    // pins the match-window, transposition, 0.7 boost threshold,
    // 4-char prefix cap, and empty-string conventions
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("abcdef", "abcxyz", 0.6666666666666666), // jaro < 0.7: no boost
      ("ab", "ba", 0.0),                        // window 0: no matches
      ("a", "", 0.0),
      ("", "", 0.0),                            // DuckDB: empty -> 0
      ("abc", "abc", 1.0),
      ("aaaaaaaaab", "aaaaaaaaba", 0.98),       // prefix capped at 4
      ("prefixonly", "prefixnotx", 0.895),
      ("dwayne", "duane", 0.8400000000000001),
      ("xyzzzzz", "xyabcde", 0.5238095238095238))
    val got = cases.toDF("a", "b", "expected")
      .withColumn("jw",
        graft.functions.StringFunctions.jaro_winkler(col("a"), col("b")))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3),
        s"${r.getString(0)}/${r.getString(1)}: " +
          s"expected ${r.getDouble(2)} got ${r.getDouble(3)}")
    }
    // SQL registration path
    graft.functions.StringFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta')").head().getDouble(0)
    assert(viaSql == 0.9611111111111111)
    // null propagation
    val n = Seq(("x", null: String)).toDF("a", "b")
      .select(graft.functions.StringFunctions.jaro_winkler(col("a"), col("b")))
      .head()
    assert(n.isNullAt(0))
  }

  test("jaroWinklerLinkage blocks on (first token, length band) and verifies") {
    import spark.implicits._
    val df = Seq(
      (1L, "red widget"), (2L, "red widgex"),   // same block, jw high
      (3L, "red gadget"),                        // same block, jw lower
      (4L, "blue widget"),                       // different first token
      (5L, "red widgetxxx")                      // outside length band
    ).toDF("id", "name")
    val got = graft.ml.Dedup.jaroWinklerLinkage(df, "id", "name",
        threshold = 0.9, lenBand = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(got.map(t => (t._1, t._2)).toSet == Set((1L, 2L)), got.toSeq)
    // pair (1,3) is blocked together but fails the 0.9 verify;
    // (1,4) never meets (block); (1,5) never meets (length band)
    val relaxed = graft.ml.Dedup.jaroWinklerLinkage(df, "id", "name",
        threshold = 0.5, lenBand = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(relaxed.contains((1L, 3L)) && !relaxed.exists(_._2 == 4L))
    assert(!relaxed.exists(t => t._1 == 5L || t._2 == 5L))
  }

  test("jaroWinklerLinkage survives a planted low-entropy block (one first token, one length)") {
    import spark.implicits._
    // worst-case blocking entropy: EVERY name shares first token
    // "john" and length 9 — without salting the whole quadratic
    // candidate space lands on one (blk, lk) key (the round-18
    // edit-distance collapse class). 120 distinct names → 7140
    // candidate pairs, all in the hot bucket.
    val names = (0 until 120).map { i =>
      (i.toLong, f"john $i%04d")
    }
    val df = names.toDF("id", "name")
    val got = graft.ml.Dedup.jaroWinklerLinkage(df, "id", "name",
        threshold = 0.93, lenBand = 0, parallelism = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
    // brute-force oracle over all unordered pairs
    def jw(a: String, b: String): Double = {
      val row = Seq((a, b)).toDF("a", "b").select(
        graft.functions.StringFunctions.jaro_winkler(col("a"), col("b")))
      row.head().getDouble(0)
    }
    // spot-check planted neighbours: "john 0001" vs "john 0011" share
    // prefix+suffix; exact expected set from the same JW expression,
    // evaluated once per pair driver-side on a small slice
    val slice = names.take(30)
    val expSlice = (for {
      (i1, s1) <- slice; (i2, s2) <- slice if i1 < i2
      v = jw(s1, s2) if v >= 0.93
    } yield (i1, i2, v)).toSet
    val gotSlice = got.filter(t => t._1 < 30 && t._2 < 30)
    assert(gotSlice == expSlice,
      s"missing=${expSlice -- gotSlice} extra=${gotSlice -- expSlice}")
    // the salted join must spread the hot bucket: with parallelism=8
    // the candidate join's shuffle has 8 distinct (blk, lk, salt)
    // keys, so no single task carries all 7140 verifies
    val salts = df.select(
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(col("name")),
          org.apache.spark.sql.functions.lit(8)).as("salt"))
      .distinct().count()
    assert(salts > 1, "salt must split the single hot block")
  }
}
