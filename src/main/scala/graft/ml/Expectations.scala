package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations, compiled into ONE aggregate
  * pass — the ingest gate a 100 TB pipeline runs before anything else
  * touches the data (the idea popularized by Deequ/Great Expectations,
  * restated as pure Column arithmetic).
  *
  * Every row-level rule becomes a conditional count inside a single
  * partial/final aggregation, so a ten-rule suite prices like one
  * `count(*)` — the scan is shared, nothing shuffles but one row per
  * rule. Distinctness rules ([[Expect.unique]]) need a grouped
  * aggregate and referential rules ([[Expect.subsetOf]]) an anti-join
  * probe, so they run as separate bounded passes; the report unions
  * all three shapes into one relation:
  *
  *   (rule, n_checked, n_failed, pass)
  *
  * Use [[Expectations.report]] for the relation (log it, gate on it),
  * or [[Expectations.assertAll]] to hard-fail the job on violations —
  * the CI-style contract.
  */
object Expectations {

  /** One named expectation. `fails` is a Column that is TRUE on a
    * violating row (null-safe: the rule constructors below wrap
    * their predicates so null never silently passes).
    */
  final case class Rule(name: String, fails: Column)

  object Expect {

    /** Column must never be null. */
    def notNull(c: String): Rule =
      Rule(s"not_null($c)", col(c).isNull)

    /** Non-null values must fall in [lo, hi]. */
    def inRange(c: String, lo: Double, hi: Double): Rule =
      Rule(s"in_range($c,$lo,$hi)",
        col(c).isNotNull && (col(c) < lo || col(c) > hi))

    /** Non-null values must match the regex anchored over the whole
      * string.
      */
    def matches(c: String, regex: String): Rule =
      Rule(s"matches($c)", col(c).isNotNull && !col(c).rlike(regex))

    /** Non-null values must be one of the allowed literals. */
    def isIn(c: String, allowed: Seq[String]): Rule =
      Rule(s"is_in($c)",
        col(c).isNotNull && !col(c).isin(allowed.map(lit(_)): _*))

    /** Custom predicate: `holds` must be TRUE on every row (a null
      * result counts as a failure — three-valued logic never lets a
      * row slip through unchecked).
      */
    def satisfies(name: String, holds: Column): Rule =
      Rule(name, !coalesce(holds, lit(false)))
  }

  /** Row-level rules in one scan: (rule, n_checked, n_failed, pass). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no expectations given")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      sum(when(r.fails, 1L).otherwise(0L)).as(s"__f$i")
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col("__n").as("n_checked"),
        coalesce(col(s"__f$i"), lit(0L)).as("n_failed"),
        (coalesce(col(s"__f$i"), lit(0L)) === 0L).as("pass"))
    }
    one.select(explode(array(stacked: _*)).as("r")).select("r.*")
  }

  /** Key-uniqueness rule as its own grouped pass: `n_failed` counts
    * the ROWS carrying a duplicated key (total occupancy of over-full
    * keys, not the number of such keys). Partial/final hash agg; the
    * violation count aggregates a second, key-cardinality-sized pass.
    */
  def uniqueReport(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "unique needs at least one key column")
    val name = s"unique(${keyCols.mkString(",")})"
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(sum("__c").as("n_checked"),
        coalesce(sum(when(col("__c") > 1L, col("__c"))), lit(0L))
          .as("n_failed"))
      .select(lit(name).as("rule"), col("n_checked").cast("long"),
        col("n_failed").cast("long"),
        (col("n_failed") === 0L).as("pass"))
  }

  /** Referential rule: every non-null `c` must appear in `dim`'s
    * `dimCol` (foreign-key containment). One anti-join probe; the dim
    * side is distinct-reduced first, and Spark broadcasts it when
    * small — the usual fact⋈dim shape.
    */
  def subsetReport(df: DataFrame, c: String, dim: DataFrame,
      dimCol: String): DataFrame = {
    val name = s"subset_of($c,$dimCol)"
    val probe = df.select(col(c)).filter(col(c).isNotNull)
    val missing = probe.join(dim.select(col(dimCol).as(c)).distinct(),
      Seq(c), "left_anti")
    val n = probe.agg(count(lit(1)).as("n_checked"))
    val f = missing.agg(count(lit(1)).as("n_failed"))
    n.crossJoin(f).select(lit(name).as("rule"),
      col("n_checked").cast("long"), col("n_failed").cast("long"),
      (col("n_failed") === 0L).as("pass"))
  }

  /** Throw (with the failing rules listed) unless every rule passes —
    * the hard ingest gate. The report DataFrame is small (one row per
    * rule), so the collect is bounded by construction.
    */
  def assertAll(reports: DataFrame*): Unit = {
    val bad = reports.map(_.filter(!col("pass"))).reduce(_.unionByName(_))
      .collect()
    if (bad.nonEmpty) {
      val detail = bad.map(r =>
        s"${r.getAs[String]("rule")}: ${r.getAs[Long]("n_failed")} of " +
          s"${r.getAs[Long]("n_checked")} rows fail").mkString("; ")
      throw new IllegalStateException(s"expectations violated — $detail")
    }
  }
}
