package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy audits for training-data release: k-anonymity and
  * l-diversity over quasi-identifier (QI) columns (Sweeney 2002;
  * Machanavajjhala et al. 2007), plus the standard suppression
  * enforcement step. Complements the per-row PII scrub
  * ([[TextAnalysis.piiCounts]]) with the DATASET-level re-identification
  * check: a row is re-identifiable when its QI combination is rare.
  *
  * Everything is one hash-aggregate over the QI key (map-side partial,
  * no row explosion), so the audit costs the same as a GROUP BY at any
  * scale; the report side is one row.
  */
object Privacy {

  /** One-row audit: with equivalence classes = distinct QI
    * combinations, report class-size k-anonymity and (when
    * `sensitive` is given) distinct-value l-diversity.
    *
    * Columns: `k`, `n_rows`, `n_classes`, `min_class_size`,
    * `n_violating_rows` (rows whose class is smaller than k),
    * `min_l_diversity` (smallest distinct-sensitive count over
    * classes; 0 when no sensitive column), `pass`.
    */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[String], k: Int,
      sensitive: Option[String] = None, l: Int = 1): DataFrame = {
    require(qiCols.nonEmpty, "k-anonymity needs at least one QI column")
    require(k >= 1 && l >= 1, "k and l must be positive")
    val ldivAgg: Column = sensitive match {
      case Some(s) => countDistinct(col(s))
      case None => lit(0L)
    }
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), ldivAgg.as("__ldiv"))
    classes.agg(
        sum("__n").as("n_rows"),
        count(lit(1)).as("n_classes"),
        min("__n").as("min_class_size"),
        coalesce(sum(when(col("__n") < k, col("__n"))), lit(0L))
          .as("n_violating_rows"),
        min("__ldiv").as("min_l_diversity"))
      .select(lit(k.toLong).as("k"),
        col("n_rows").cast("long"),
        col("n_classes").cast("long"),
        col("min_class_size").cast("long"),
        col("n_violating_rows").cast("long"),
        col("min_l_diversity").cast("long"),
        (col("n_violating_rows") === 0L &&
          (col("min_l_diversity") >= l.toLong || lit(sensitive.isEmpty)))
          .as("pass"))
  }

  /** Suppression enforcement: keep only rows whose QI equivalence
    * class has ≥ k members — the released table is k-anonymous by
    * construction. Implemented as a window COUNT over the QI key (one
    * shuffle on the QI columns, no join-back).
    */
  def suppressSmallClasses(df: DataFrame, qiCols: Seq[String],
      k: Int): DataFrame = {
    require(qiCols.nonEmpty, "suppression needs at least one QI column")
    val w = Window.partitionBy(qiCols.map(col): _*)
    df.withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") >= k)
      .drop("__n")
  }

  /** Generalization helper: coarsen a numeric QI into fixed-width
    * buckets (the usual first move when suppression would drop too
    * much) — floor(x / width) · width, labeled as the bucket start.
    */
  def generalizeNumeric(c: Column, width: Double): Column =
    (floor(c / width) * width).cast("double")

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) with
    * total-variation distance: for each QI equivalence class, the TVD
    * between the class's sensitive-value distribution Q and the
    * global distribution P — k-anonymity and l-diversity still leak
    * when a class's sensitive values are skewed vs the population;
    * t-closeness bounds that skew. Returns one row per class:
    * (qiCols…, n, tvd, pass = tvd ≤ t).
    *
    * TVD = ½ Σ_s |Q(s) − P(s)| over the GLOBAL domain; sensitive
    * values absent from a class contribute ½ Σ_absent P(s) =
    * ½ (1 − Σ_present P(s)), so the whole audit is one (QI, s) joint
    * aggregate, a window for class totals, a join to the (small)
    * global frequency table, and one final per-class aggregate — no
    * domain cross product.
    */
  def tClosenessReport(df: DataFrame, qiCols: Seq[String],
      sensitive: String, t: Double): DataFrame = {
    require(qiCols.nonEmpty, "t-closeness needs at least one QI column")
    require(t >= 0.0 && t <= 1.0, "t must be in [0, 1]")
    val joint = df.groupBy((qiCols :+ sensitive).map(col): _*)
      .agg(count(lit(1)).as("__ns"))
    val withClass = joint.withColumn("__nc",
      sum("__ns").over(Window.partitionBy(qiCols.map(col): _*)))
    // global P(s): one aggregate over the sensitive column; the total
    // is a 1-row aggregate broadcast back onto the tiny domain table
    // (no global window, no driver-side count)
    val gs = df.groupBy(col(sensitive)).agg(count(lit(1)).as("__gs"))
    val globalP = gs.crossJoin(broadcast(gs.agg(sum("__gs").as("__tot"))))
      .select(col(sensitive), (col("__gs") / col("__tot")).as("__p"))
    withClass.join(globalP, Seq(sensitive))
      .withColumn("__q", col("__ns") / col("__nc"))
      .groupBy(qiCols.map(col): _*)
      .agg(max("__nc").cast("long").as("n"),
        ((sum(abs(col("__q") - col("__p"))) +
          (lit(1.0) - sum("__p"))) / 2.0).as("tvd"))
      .withColumn("pass", col("tvd") <= t)
  }

  /** ε-differentially-private group counts (Laplace mechanism,
    * Dwork et al. 2006; count sensitivity = `sensitivity`, scale
    * b = sensitivity/ε) with DETERMINISTIC seeded noise: the uniform
    * draw is the md5 of (seed, group key) mapped to (0,1), pushed
    * through the Laplace inverse CDF −b·sgn(u−½)·ln(1−2|u−½|).
    * Seeding makes the release replayable and auditable (and
    * engine-replayable for the oracle gate); real deployments rotate
    * the seed per release — reusing a seed across releases of the
    * SAME statistic spends no extra budget, while fresh seeds
    * compose by the usual ε-sum.
    *
    * Returns (groupCols…, n, noised_n). `n` is the true count, kept
    * for audit pipelines — drop it (and publish only `noised_n`)
    * in the released artifact.
    *
    * One hash aggregate + per-row Column arithmetic; no window, no
    * join — scales to any group cardinality.
    */
  def laplaceNoisedCounts(df: DataFrame, groupCols: Seq[String],
      epsilon: Double, seed: String,
      sensitivity: Double = 1.0): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(epsilon > 0.0, "epsilon must be positive")
    require(sensitivity > 0.0, "sensitivity must be positive")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("noised_n",
        col("n") + seededLaplace(groupCols, seed, sensitivity / epsilon))
  }

  /** ε-DP group SUMS: each row's contribution is clipped to
    * [clipLo, clipHi] before aggregation (the standard bounded-
    * contribution step), so one row's presence changes the sum by at
    * most max(|clipLo|, |clipHi|) — that is the Laplace sensitivity.
    * Same seeded deterministic noise as [[laplaceNoisedCounts]].
    *
    * Returns (groupCols…, clipped_sum, noised_sum); publish only
    * `noised_sum`.
    */
  def laplaceNoisedSums(df: DataFrame, groupCols: Seq[String],
      valueCol: String, clipLo: Double, clipHi: Double,
      epsilon: Double, seed: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(epsilon > 0.0, "epsilon must be positive")
    require(clipLo < clipHi, "clip range must be non-empty")
    val sens = math.max(math.abs(clipLo), math.abs(clipHi))
    require(sens > 0.0, "clip range must allow a nonzero contribution")
    val clipped = least(greatest(col(valueCol).cast("double"),
      lit(clipLo)), lit(clipHi))
    df.groupBy(groupCols.map(col): _*)
      .agg(sum(clipped).as("clipped_sum"))
      .withColumn("noised_sum",
        col("clipped_sum") + seededLaplace(groupCols, seed, sens / epsilon))
  }

  /** Laplace(0, scale) noise as a deterministic Column: md5 of
    * (seed, group key) → uniform in (0,1) → inverse CDF
    * −b·sgn(u−½)·ln(1−2|u−½|). (int + 0.5)/2^32 is never exactly
    * 0, ½, or close enough to 1 to reach ln(0).
    */
  private def seededLaplace(groupCols: Seq[String], seed: String,
      scale: Double): Column = {
    val key = concat_ws("\u0001",
      groupCols.map(c => col(c).cast("string")): _*)
    val h = substring(md5(concat_ws(":", lit(seed), key)), 1, 8)
    val u = (conv(h, 16, 10).cast("long") + lit(0.5)) /
      lit(4294967296.0)
    val centered = u - lit(0.5)
    lit(-scale) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered))
  }
}
