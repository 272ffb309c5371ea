package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage à la Fellegi–Sunter (1969): given
  * CANDIDATE pairs (from any blocking — the fuzzy-join machinery,
  * an exact key, an LSH bucket) with binary field-agreement columns
  * γ_j, estimate the match/unmatch agreement probabilities by EM and
  * score every pair with the classic log-likelihood match weight.
  * The entity-resolution core under dedup across sources — where
  * near-dup text similarity ends and "are these the same ENTITY"
  * begins.
  *
  * The EM trainer follows this library's one-aggregate-per-iteration
  * discipline (QualityModel/Softmax): the E-step posterior is a
  * codegen'd Column with the current parameters baked in as
  * literals, and the M-step sums (Σg, Σg·γ_j, Σ(1−g)·γ_j) come back
  * as ONE short row per iteration. Nothing but a (2J+1)-double
  * vector ever reaches the driver; candidate-pair cardinality is
  * unbounded.
  *
  * Probabilities are clamped to [clamp, 1−clamp] so degenerate
  * fields (perfect agreement among matches) keep every weight
  * finite — the standard guard, and part of the deterministic
  * contract the oracle replays.
  */
object Linkage {

  final case class Params(p: Double, m: Array[Double], u: Array[Double])

  private def clampD(x: Double, c: Double): Double =
    math.min(1.0 - c, math.max(c, x))

  /** P(γ | class)·prior as a Column, params as literals. */
  private def mass(gammaCols: Seq[String], prior: Double,
      probs: Array[Double]): Column =
    gammaCols.zip(probs).foldLeft(lit(prior)) { case (acc, (g, pj)) =>
      acc * when(col(g), pj).otherwise(1.0 - pj)
    }

  /** EM estimation of (p, m_j, u_j) over candidate pairs with binary
    * agreement columns `gammaCols`. One tiny aggregate per iteration.
    */
  def emTrain(pairs: DataFrame, gammaCols: Seq[String], iters: Int = 5,
      init: Params = Params(0.1, Array.empty, Array.empty),
      clamp: Double = 1e-6): Params = {
    require(gammaCols.nonEmpty, "gammaCols must be non-empty")
    require(iters >= 0, "iters must be >= 0")
    val j = gammaCols.size
    var p = init.p
    var m = if (init.m.nonEmpty) init.m else Array.fill(j)(0.9)
    var u = if (init.u.nonEmpty) init.u else Array.fill(j)(0.1)
    require(m.length == j && u.length == j, "param arity mismatch")
    var i = 0
    while (i < iters) {
      val w = mass(gammaCols, p, m)
      val v = mass(gammaCols, 1.0 - p, u)
      val g = w / (w + v)
      val aggs =
        sum(g).as("sg") +: sum(lit(1.0) - g).as("sn") +:
          (gammaCols.map(c => sum(when(col(c), g).otherwise(0.0))) ++
            gammaCols.map(c =>
              sum(when(col(c), lit(1.0) - g).otherwise(0.0))))
            .zipWithIndex.map { case (e, k) => e.as(s"s$k") }
      val row = pairs.agg(count(lit(1)).cast("double").as("n"), aggs: _*)
        .head()
      val n = row.getDouble(0)
      // an empty candidate set has nothing to estimate from — keep
      // the current parameters rather than dividing into NaNs
      if (n == 0.0) return Params(p, m, u)
      val sg = row.getDouble(1)
      val sn = row.getDouble(2)
      p = clampD(sg / n, clamp)
      m = Array.tabulate(j)(k => clampD(row.getDouble(3 + k) / sg, clamp))
      u = Array.tabulate(j)(k =>
        clampD(row.getDouble(3 + j + k) / sn, clamp))
      i += 1
    }
    Params(p, m, u)
  }

  /** Score candidate pairs with trained parameters: appends
    * `match_weight` (Σ_j log2 of the agreement likelihood ratio —
    * the Fellegi–Sunter decision statistic) and `posterior`
    * (P(match | γ) under the model). Pure Column program.
    */
  def score(pairs: DataFrame, gammaCols: Seq[String],
      params: Params): DataFrame = {
    require(params.m.length == gammaCols.size &&
      params.u.length == gammaCols.size, "param arity mismatch")
    val ln2 = math.log(2.0)
    val weight = gammaCols.zipWithIndex.map { case (g, k) =>
      val (mj, uj) = (params.m(k), params.u(k))
      when(col(g), log(lit(mj) / uj) / ln2)
        .otherwise(log(lit(1.0 - mj) / (1.0 - uj)) / ln2)
    }.reduce(_ + _)
    val w = mass(gammaCols, params.p, params.m)
    val v = mass(gammaCols, 1.0 - params.p, params.u)
    pairs
      .withColumn("match_weight", weight)
      .withColumn("posterior", w / (w + v))
  }

  /** Three-way Fellegi–Sunter decision on a scored pair set:
    * `match` above `upper`, `non_match` below `lower`, else
    * `possible` (the clerical-review band).
    */
  def classify(scored: DataFrame, upper: Double,
      lower: Double): DataFrame = {
    require(upper >= lower, "upper must be >= lower")
    scored.withColumn("decision",
      when(col("match_weight") >= upper, "match")
        .when(col("match_weight") < lower, "non_match")
        .otherwise("possible"))
  }

  /** American Soundex phonetic key (Russell 1918, the NARA variant
    * with the H/W-transparency rule) — the classic BLOCKING key for
    * name fields: "Robert"/"Rupert" → R163, so the candidate
    * generator feeding [[emTrain]] pairs only within a code bucket
    * instead of all-pairs. Pure codegen'd Column program (string
    * functions only, no UDF, no backreference regex — RE2-safe):
    *
    *  1. letters only, uppercased; empty → NULL
    *  2. H/W dropped AFTER the first letter (same-code letters
    *     separated by h/w collapse — "Ashcraft" → A261 not A226)
    *  3. letters → digit classes (vowels → 0 as separators)
    *  4. adjacent equal digits collapse (one regexp per digit class
    *     — RE2 has no backreferences)
    *  5. the FIRST digit (the coded first letter, which always
    *     survives collapsing as its run's head) is dropped, vowel
    *     separators are removed, and the rest is right-padded with
    *     zeros to code length 3 behind the leading letter
    */
  def soundex(c: Column): Column = {
    val letters = upper(regexp_replace(c, "[^A-Za-z]", ""))
    val first = substring(letters, 1, 1)
    val body = concat(first,
      translate(substring(letters, 2, 1 << 20), "HW", ""))
    val digits = translate(body,
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202")
    val collapsed = (0 to 6).foldLeft(digits) { (d, i) =>
      regexp_replace(d, s"$i$i+", s"$i")
    }
    val rest = regexp_replace(
      substring(collapsed, 2, 1 << 20), "0", "")
    when(length(letters) === 0, lit(null))
      .otherwise(concat(first, rpad(substring(rest, 1, 3), 3, "0")))
  }

  /** Phonetic-blocked candidate pairs: distinct values of `nameCol`
    * keyed by [[soundex]], paired within a code bucket (a < b), with
    * buckets above `maxBlock` dropped whole — the skew guard every
    * blocking scheme needs (one degenerate code must not produce a
    * quadratic bucket; the same hub-cap discipline as the wedge
    * join). Returns (code, a, b).
    *
    * Scale shape: one distinct aggregate, one bucket-count
    * aggregate, one code-keyed self-join — pairs only ever form
    * inside a bounded bucket.
    */
  def phoneticPairs(df: DataFrame, nameCol: String,
      maxBlock: Int = 1000): DataFrame = {
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    val keyed = graft.core.PipelineCaches.persistTracked(
      df.select(col(nameCol).cast("string").as("name")).distinct()
        .select(col("name"), soundex(col("name")).as("code"))
        .filter(col("code").isNotNull))
    val ok = keyed.groupBy("code").agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= maxBlock)
    // Semi-join the size guard BEFORE the self-join: without CBO stats
    // Catalyst keeps join order as written, so guarding after the
    // self-join would still FORM the quadratic pairs of an oversized
    // bucket and only then discard them — the cap must bound work, not
    // just output.
    val bounded = keyed.join(ok.select("code"), Seq("code"), "left_semi")
    bounded.alias("x").join(bounded.alias("y"), "code")
      .filter(col("x.name") < col("y.name"))
      .select(col("code"), col("x.name").as("a"), col("y.name").as("b"))
  }
}
