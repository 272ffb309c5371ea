package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.GraftSession

/** One correctness-gate entry: a Spark query plus (optionally) the
  * equivalent DuckDB SQL over the same parquet tables. Results must be
  * deterministic: every query ends in a total ORDER BY and rounds
  * floating-point aggregates, so a value-hash compare is stable across
  * engines and summation orders.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryGroup {
  def all: Seq[QueryDef]

  protected def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraftSession.table(s, dir, name)

  protected def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))

  protected def qNoOracle(name: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
