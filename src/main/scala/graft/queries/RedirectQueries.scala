package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ir._
import graft.ir.Component._
import graft.dag.{DataFlowExec, PipelineContext}

/** Error-row redirection (SSIS errorRowDisposition=RedirectRow) and
  * Lookup no-match redirection under the oracle gate. ANSI mode makes
  * bad casts THROW in Spark 4 — these queries prove the engine turns
  * such per-row failures into routed rows, not task failures, with
  * results DuckDB reproduces via TRY_CAST-style predicates. */
object RedirectQueries extends QueryPack {

  private def run(s: SparkSession, dir: String, flow: DataFlow): Map[String, DataFrame] =
    DataFlowExec.run(flow, PipelineContext.overDir(s, dir))

  private def flow48 = DataFlow("q48", Seq(
    SourceTable("src", "orders", columns = Seq("o_orderkey")),
    DerivedColumn("mk", Seq("s" ->
      "(DT_I4)o_orderkey % 2 == 0 ? \"123\" : \"7abc\"")),
    DerivedColumn("conv", Seq("val" -> "(DT_I4)s"),
      errorOutput = Some("err"))),
    Seq(Path("src", "mk"), Path("mk", "conv")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q48_error_redirect_ok" -> { (s, dir) =>
      run(s, dir, flow48)("conv.out")
        .select(col("o_orderkey"), col("val"))
        .orderBy(col("o_orderkey"))
    },

    "q49_error_redirect_err" -> { (s, dir) =>
      run(s, dir, flow48)("conv.err")
        .select(col("o_orderkey"), col("s"))
        .orderBy(col("o_orderkey"))
    },

    "q50_lookup_nomatch" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      val flow = DataFlow("q50", Seq(
        SourceTable("src", "orders", columns = Seq("o_orderkey", "o_custkey")),
        Lookup("lk", refTable = "",
          joinKeys = Seq("o_custkey" -> "c_custkey"),
          copyColumns = Seq("c_name" -> "c_name"),
          noMatch = NoMatchBehavior.Redirect,
          refSql = Some("SELECT c_custkey, c_name FROM customer WHERE c_custkey < 700"))),
        Seq(Path("src", "lk")))
      run(s, dir, flow)("lk.nomatch")
        .orderBy(col("o_orderkey"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q48_error_redirect_ok" ->
      """SELECT o_orderkey, 123 AS val FROM orders
        |WHERE o_orderkey % 2 = 0 ORDER BY o_orderkey""".stripMargin,
    "q49_error_redirect_err" ->
      """SELECT o_orderkey, '7abc' AS s FROM orders
        |WHERE o_orderkey % 2 <> 0 ORDER BY o_orderkey""".stripMargin,
    "q50_lookup_nomatch" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey < 700)
        |ORDER BY o_orderkey""".stripMargin
  )
}
