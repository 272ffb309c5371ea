package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query over the driver's parquet testdata, with (where
  * SQL-expressible) an equivalent DuckDB oracle. Queries are organized
  * by capability group under [[graft.queries]].
  */
object SparkEntry {

  private[graft] def groups: Seq[QueryGroup] = Seq(
    RelationalQueries,
    JoinStrategyQueries,
    TypedQueries,
    EventQueries,
    MatrixQueries,
    TextQueries,
    DedupQueries,
    EmbeddingQueries,
    ExtrasQueries,
    EvalQueries,
    SupersetQueries,
    CurationQueries,
    StatsQueries)

  private lazy val defs: Seq[QueryDef] = groups.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    queries("q_agg_groupby")(spark, dir)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
