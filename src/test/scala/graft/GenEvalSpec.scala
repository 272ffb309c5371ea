package graft

import org.apache.spark.sql.functions._
import graft.ml.GenEval

class GenEvalSpec extends SparkSpec {

  // driver-side reference implementations ---------------------------------

  private def tok(s: String): Array[String] =
    graft.ml.Dedup.MinHashUtil.normalize(s).split(" ").filter(_.nonEmpty)

  private def grams(t: Array[String], n: Int): Seq[String] =
    if (t.length < n) Seq.empty else t.sliding(n).map(_.mkString(" ")).toSeq

  private def clipOverlap(c: Seq[String], r: Seq[String]): Long = {
    val rc = r.groupBy(identity).view.mapValues(_.size).toMap
    c.groupBy(identity).map { case (g, cs) =>
      math.min(cs.size, rc.getOrElse(g, 0)).toLong
    }.sum
  }

  test("corpus BLEU matches a hand-computed reference on a small pair set") {
    import spark.implicits._
    val pairs = Seq(
      (1L, "the cat sat on the mat", "the cat sat on the mat"),
      (2L, "a fast brown fox", "the quick brown fox jumps"),
      (3L, "entirely different words here", "nothing matches at all"))
    val got = GenEval.bleu(pairs.toDF("id", "cand", "ref"),
      "id", "cand", "ref", maxN = 2).head()
    // hand computation (corpus-level sums)
    val ts = pairs.map { case (_, c, r) => (tok(c), tok(r)) }
    def p(n: Int): Double = {
      val num = ts.map { case (c, r) => clipOverlap(grams(c, n), grams(r, n)) }.sum
      val den = ts.map { case (c, _) => grams(c, n).size.toLong }.sum
      num.toDouble / den
    }
    val clen = ts.map(_._1.length).sum
    val rlen = ts.map(_._2.length).sum
    val bp = if (clen >= rlen) 1.0 else math.exp(1.0 - rlen.toDouble / clen)
    val want = math.exp((math.log(p(1)) + math.log(p(2))) / 2) * bp
    assert(math.abs(got.getAs[Double]("bleu") - want) < 1e-12,
      s"${got.getAs[Double]("bleu")} vs $want")
    assert(math.abs(got.getAs[Double]("p1") - p(1)) < 1e-12)
    assert(math.abs(got.getAs[Double]("p2") - p(2)) < 1e-12)
    assert(got.getAs[Long]("cand_tokens") == clen)
    // identical corpus scores BLEU 1
    val perfect = GenEval.bleu(
      pairs.map(t => (t._1, t._3, t._3)).toDF("id", "cand", "ref"),
      "id", "cand", "ref", maxN = 4).head()
    assert(math.abs(perfect.getAs[Double]("bleu") - 1.0) < 1e-12)
    // a zero corpus precision at some order zeroes BLEU (no smoothing)
    val zero = GenEval.bleu(
      Seq((1L, "a b", "c d")).toDF("id", "cand", "ref"),
      "id", "cand", "ref", maxN = 2).head()
    assert(zero.getAs[Double]("bleu") == 0.0)
  }

  test("rougeN matches brute force; rougeL is exact on subsequence candidates") {
    import spark.implicits._
    val pairs = Seq(
      (1L, "the cat sat", "the cat sat on the mat"),
      (2L, "the the the", "the mat"),
      (3L, "no overlap here", "completely disjoint reference"))
    val df = pairs.toDF("id", "cand", "ref")
    val got1 = GenEval.rougeN(df, "id", "cand", "ref", n = 1)
      .collect().map(r => r.getLong(0) -> r).toMap
    pairs.foreach { case (id, c, r) =>
      val (ct, rt) = (tok(c), tok(r))
      val ov = clipOverlap(grams(ct, 1), grams(rt, 1))
      val row = got1(id)
      assert(row.getAs[Long]("overlap") == ov, s"id $id")
      assert(math.abs(row.getAs[Double]("recall") - ov.toDouble / rt.length) < 1e-12)
    }
    // "the the the" vs "the mat": clipping caps overlap at ref's 1 "the"
    assert(got1(2L).getAs[Long]("overlap") == 1L)
    // rougeL: a candidate formed by DELETING tokens is an exact
    // subsequence -> lcs == cand length, precision == 1
    val rl = GenEval.rougeL(
      Seq((1L, "the sat on mat", "the cat sat on the mat"))
        .toDF("id", "cand", "ref"), "id", "cand", "ref").head()
    assert(rl.getAs[Int]("lcs") == 4)
    assert(rl.getAs[Double]("precision") == 1.0)
    assert(math.abs(rl.getAs[Double]("recall") - 4.0 / 6) < 1e-12)
    // crossing order costs: "b a" vs "a b" has LCS 1
    val cross = GenEval.rougeL(Seq((1L, "b a", "a b")).toDF("id", "cand", "ref"),
      "id", "cand", "ref").head()
    assert(cross.getAs[Int]("lcs") == 1)
  }

  test("kendallTau: perfect, reversed, tie-corrected, and degenerate groups") {
    import spark.implicits._
    val rows =
      (1 to 10).map(i => ("asc", i.toDouble, (i * 2).toDouble)) ++
      (1 to 10).map(i => ("desc", i.toDouble, (20 - i).toDouble)) ++
      // ties: the 2x2 grid (1,1),(1,2),(2,1),(2,2) -> one concordant
      // diagonal, one discordant anti-diagonal, tx=ty=2, n0=6
      Seq(("tied", 1.0, 1.0), ("tied", 1.0, 2.0), ("tied", 2.0, 1.0),
        ("tied", 2.0, 2.0)) ++
      Seq(("flat", 3.0, 1.0), ("flat", 3.0, 2.0)) // all x tied -> NULL
    val got = GenEval.kendallTau(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("asc").getAs[Double]("tau") == 1.0)
    assert(got("desc").getAs[Double]("tau") == -1.0)
    val tied = got("tied")
    assert(tied.getAs[Long]("concordant") == 1L &&
      tied.getAs[Long]("discordant") == 1L)
    assert(math.abs(tied.getAs[Double]("tau")) < 1e-12) // 0/sqrt(4*4)
    assert(got("flat").isNullAt(got("flat").fieldIndex("tau")))
    // group-size guard
    intercept[org.apache.spark.SparkException] {
      GenEval.kendallTau(
        (1 to 50).map(i => ("g", i.toDouble, i.toDouble)).toDF("g", "x", "y"),
        "g", "x", "y", maxGroup = 10).collect()
    }
  }

  test("wer: exact S/D/I decomposition on hand alignments") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c", "a b c"),          // identical
      (2L, "a x c", "a b c"),          // 1 substitution
      (3L, "a b c d", "a b c"),        // 1 insertion
      (4L, "a c", "a b c"),            // 1 deletion
      (5L, "x y z q", "a"),            // 1 sub + 3 ins, wer 4 > 1
      (6L, "", "a b"),                 // empty cand: 2 deletions
      (7L, "a b", ""),                 // empty ref: row dropped
      (8L, "b a", "a b")               // tie: match-max path = 1D+1I
    ).toDF("id", "cand", "ref")
    val got = GenEval.wer(df, "id", "cand", "ref")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
          r.getDouble(7)))).toMap
    assert(got(1L) == ((0, 0, 0, 0, 0.0)))
    assert(got(2L) == ((1, 1, 0, 0, 1.0 / 3)))
    assert(got(3L) == ((1, 0, 0, 1, 1.0 / 3)))
    assert(got(4L) == ((1, 0, 1, 0, 1.0 / 3)))
    assert(got(5L) == ((4, 1, 0, 3, 4.0)))
    assert(got(6L) == ((2, 0, 2, 0, 1.0)))
    assert(!got.contains(7L))
    // dist 2 either as 2 subs or del+ins; the match-maximizing
    // tie-break keeps one token aligned -> S=0, D=1, I=1
    assert(got(8L) == ((2, 0, 1, 1, 1.0)))
    // identity: distance = S + D + I on every row
    got.values.foreach { case (d, s, dl, i, _) => assert(d == s + dl + i) }
  }
}
