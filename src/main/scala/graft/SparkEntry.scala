package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Query packs are added per milestone; later packs may not shadow
    * earlier keys (asserted in tests). */
  private def packs: Seq[QueryPack] = Seq(
    CoreQueries,
    TransformQueries,
    EngineQueries,
    GoldenQueries,
    ExtQueries,
    IoQueries,
    FuzzyQueries,
    EventQueries,
    MutationQueries,
    RedirectQueries,
    DtsxQueries,
    TokenizerQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap

  /** Shared memoized fixtures for Bench's pre-build phase (see
    * [[graft.queries.QueryPack.fixtures]]). */
  def fixtures: Map[String, (SparkSession, String) => Unit] =
    packs.flatMap(_.fixtures).toMap

  /** Which query names ride each fixture (see
    * [[graft.queries.QueryPack.fixtureUsers]]). */
  def fixtureUsers: Map[String, Set[String]] =
    packs.flatMap(_.fixtureUsers).toMap
}
