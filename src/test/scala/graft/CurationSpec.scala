package graft

import org.apache.spark.sql.functions._
import graft.ml.{Calibrate, GenEval, Keywords, Preference}

/** Hand-computed references for the round-8 curation/eval operators:
  * RAKE, TextRank, chrF, Holt–Winters, conformal intervals, DPO
  * pairs — plus regression cases for the WER prefix/suffix-strip +
  * token-interning optimization (the S/D/I decomposition must be
  * unchanged by the strip).
  */
class CurationSpec extends SparkSpec {

  test("rake: stopword-delimited phrases scored deg/freq") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox and the lazy dog of doom"),
      (2L, "alpha beta the alpha beta"))
      .toDF("doc_id", "text")
    val got = Keywords.rake(df, "doc_id", "text", maxPhraseLen = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    // doc 1: phrases (quick brown fox), (lazy dog), (doom); every word
    // unique → wscore = phrase len; phrase score = len².
    // doc 2: "alpha beta" twice → freq 2 / deg 4 per word → wscore 2,
    // phrase score 4, ONE output row for the repeated phrase.
    assert(got === Set(
      (1L, "quick brown fox", 3L, 9.0),
      (1L, "lazy dog", 2L, 4.0),
      (1L, "doom", 1L, 1.0),
      (2L, "alpha beta", 2L, 4.0)))
  }

  test("rake: phrases longer than maxPhraseLen are dropped") {
    import spark.implicits._
    val df = Seq((1L, "one two three four five")).toDF("doc_id", "text")
    assert(Keywords.rake(df, "doc_id", "text", maxPhraseLen = 4).count() === 0)
    assert(Keywords.rake(df, "doc_id", "text", maxPhraseLen = 5).count() === 1)
  }

  test("textrank: symmetric pair converges to uniform, isolated word keeps the teleport floor") {
    import spark.implicits._
    val df = Seq((1L, "xx yy"), (2L, "zz")).toDF("doc_id", "text")
    val got = Keywords.textRank(df, "doc_id", "text", damping = 0.85,
      iters = 10).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === Set("xx", "yy", "zz"))
    // zz has no edges: exactly the floor (1-d)/3 every iteration
    assert(math.abs(got("zz") - 0.05) < 1e-12)
    // xx/yy are symmetric (bit-identical) and approach 1/3 fixpoint
    assert(got("xx") === got("yy"))
    assert(math.abs(got("xx") - 1.0 / 3) < 0.01)
  }

  test("chrF: identical pair scores 1, disjoint 0, partial matches hand math") {
    import spark.implicits._
    val df = Seq(
      (1L, "abc", "abc"),
      (2L, "abc", "xyz"),
      (3L, "ab", "abab")).toDF("id", "cand", "ref")
    val got = GenEval.chrF(df, "id", "cand", "ref", maxN = 2, beta = 2.0)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(1L) === ((1.0, 1.0, 1.0)))
    assert(got(2L) === ((0.0, 0.0, 0.0)))
    // cand=ab ref=abab: P1=1, R1=1/2; P2=1, R2=1/3 → P=1, R=5/12,
    // F2 = 5PR/(4P+R) = 25/53
    val (p, r, f) = got(3L)
    assert(math.abs(p - 1.0) < 1e-12)
    assert(math.abs(r - 5.0 / 12) < 1e-12)
    assert(math.abs(f - 25.0 / 53) < 1e-12)
  }

  test("wer: strip+intern keeps the exact S/D/I decomposition") {
    import spark.implicits._
    val df = Seq(
      (1L, "a x c", "a b c"), // one substitution inside common affixes
      (2L, "b c", "a b c d"), // two deletions
      (3L, "x y a b z", "a b"), // three insertions, no strip possible
      (4L, "a b c", "a b c"), // identical → fully stripped
      (5L, "", "a b")) // empty candidate
      .toDF("id", "cand", "ref")
    val got = GenEval.wer(df, "id", "cand", "ref")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
          r.getDouble(7)))).toMap
    assert(got(1L) === ((1, 1, 0, 0, 1.0 / 3)))
    assert(got(2L) === ((2, 0, 2, 0, 0.5)))
    assert(got(3L) === ((3, 0, 0, 3, 1.5)))
    assert(got(4L) === ((0, 0, 0, 0, 0.0)))
    assert(got(5L) === ((2, 0, 2, 0, 1.0)))
  }

  test("holtWinters: recursion matches the hand-unrolled updates") {
    import spark.implicits._
    // counts 1..6 in buckets 0..5 (periodSec=1), seasonLen=2
    val rows = (0 until 6).flatMap(b => Seq.fill(b + 1)(("k", b.toLong)))
    val df = rows.toDF("key", "sec")
    val got = graft.events.Events.holtWinters(df, "key", "sec",
      periodSec = 1L, seasonLen = 2, alpha = 0.3, beta = 0.1, gamma = 0.2)
      .orderBy("bucket").collect()
    assert(got.length === 4) // t = 2..5
    val r0 = got(0) // t=2: l0=1.5 b0=1 s=[-0.5,0.5]
    assert(r0.getLong(1) === 2L && r0.getDouble(2) === 3.0)
    assert(math.abs(r0.getDouble(3) - 2.8) < 1e-12) // level
    assert(math.abs(r0.getDouble(4) - 1.03) < 1e-12) // trend
    assert(math.abs(r0.getDouble(5) - (-0.36)) < 1e-12) // seasonal
    assert(math.abs(r0.getDouble(6) - 2.0) < 1e-12) // fitted
    val r1 = got(1) // t=3
    assert(math.abs(r1.getDouble(3) - 3.731) < 1e-12)
    assert(math.abs(r1.getDouble(4) - 1.0201) < 1e-12)
    assert(math.abs(r1.getDouble(5) - 0.4538) < 1e-12)
    assert(math.abs(r1.getDouble(6) - 4.33) < 1e-12)
  }

  test("holtWinters: series shorter than two seasons are dropped, gaps zero-fill") {
    import spark.implicits._
    val short = Seq(("s", 0L), ("s", 1L), ("s", 2L)).toDF("key", "sec")
    assert(graft.events.Events.holtWinters(short, "key", "sec", 1L, 2)
      .count() === 0)
    // buckets 0 and 3 only → dense range 0..3 with zeros in 1,2
    val gappy = Seq(("g", 0L), ("g", 3L)).toDF("key", "sec")
    val got = graft.events.Events.holtWinters(gappy, "key", "sec", 1L, 2)
      .orderBy("bucket").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(2L, 3L))
    assert(got.map(_.getDouble(2)).toSeq === Seq(0.0, 1.0))
  }

  test("conformal: discrete k-th order statistic and coverage") {
    import spark.implicits._
    val cal = (1 to 10).map(i => ("g", i.toDouble)).toDF("grp", "s")
    val ev = Seq(("g", 5.0), ("g", 9.0), ("g", 9.5), ("g", 10.0))
      .toDF("grp", "s")
    val got = Calibrate.conformal(cal, "grp", "s", alpha = 0.2,
      evalDf = Some(ev)).collect().head
    // k = ceil(11 * 0.8) = 9 → qhat = 9; covered: 5, 9
    assert(got.getLong(1) === 10L && got.getLong(2) === 9L)
    assert(got.getDouble(3) === 9.0)
    assert(got.getLong(4) === 4L && got.getLong(5) === 2L)
    assert(got.getDouble(6) === 0.5)
  }

  test("conformal: k > n yields NULL radius = infinite interval, full coverage") {
    import spark.implicits._
    val cal = Seq(("g", 1.0), ("g", 2.0)).toDF("grp", "s")
    val ev = Seq(("g", 100.0)).toDF("grp", "s")
    val got = Calibrate.conformal(cal, "grp", "s", alpha = 0.2,
      evalDf = Some(ev)).collect().head
    assert(got.getLong(2) === 3L) // k = ceil(3*0.8) = 3 > n = 2
    assert(got.isNullAt(3))
    assert(got.getLong(5) === 1L && got.getDouble(6) === 1.0)
  }

  test("dpoPairs: outside-in pairing, margin floor, odd-group center unused") {
    import spark.implicits._
    val df = Seq(
      ("p1", "r1", 10.0), ("p1", "r2", 1.0), ("p1", "r3", 7.0),
      ("p1", "r4", 3.0), ("p1", "r5", 5.0),
      ("p2", "a", 4.0), ("p2", "b", 2.0), ("p2", "c", 3.0))
      .toDF("prompt", "resp", "score")
    val all = Preference.dpoPairs(df, "prompt", "resp", "score",
      minMargin = 0.0, maxPairsPerPrompt = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getDouble(6))).toSet
    assert(all === Set(
      ("p1", 1, "r1", "r2", 9.0), ("p1", 2, "r3", "r4", 4.0),
      ("p2", 1, "a", "b", 2.0))) // n=3: only one non-crossing pair
    val margined = Preference.dpoPairs(df, "prompt", "resp", "score",
      minMargin = 5.0, maxPairsPerPrompt = 2).collect()
    assert(margined.map(r => (r.getString(0), r.getString(2))).toSet ===
      Set(("p1", "r1")))
  }
}
