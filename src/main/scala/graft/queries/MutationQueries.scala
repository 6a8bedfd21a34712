package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Mutations

/** SCD Type 1/2 under the oracle gate (VERDICT r1 §2.7 row 36: "no
  * query"). Target snapshot, history rows, and the feed (changed /
  * unchanged / brand-new keys) all derive deterministically from the
  * customer table so DuckDB can reproduce the exact expected output.
  * Money runs through integer cents. */
object MutationQueries extends QueryPack {

  private def base(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer").select(
      col("c_custkey"), col("c_name"),
      round(col("c_acctbal") * 100).cast("long").as("bal_cents"))

  // current snapshot + pre-existing history rows for every 7th key
  private def target2(cur: DataFrame): DataFrame = {
    val current = cur
      .withColumn("valid_from", lit("2020-01-01"))
      .withColumn("valid_to", lit(null).cast("string"))
      .withColumn("is_current", lit(true))
    val history = cur.filter(col("c_custkey") % 7 === 0)
      .withColumn("bal_cents", col("bal_cents") - 5)
      .withColumn("valid_from", lit("2019-01-01"))
      .withColumn("valid_to", lit("2019-12-31"))
      .withColumn("is_current", lit(false))
    current.unionByName(history)
  }

  // every 3rd key changes balance; every 5th key also appears as a new
  // (unseen) business key
  private def feed(cur: DataFrame): DataFrame =
    cur.withColumn("bal_cents",
        col("bal_cents") + when(col("c_custkey") % 3 === 0, 1000).otherwise(0))
      .unionByName(cur.filter(col("c_custkey") % 5 === 0).select(
        (col("c_custkey") + 1000000).as("c_custkey"),
        lit("new customer").as("c_name"),
        lit(123L).as("bal_cents")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q44_scd2" -> { (s, dir) =>
      val cur = base(s, dir)
      Mutations.scdType2(target2(cur), feed(cur),
          keys = Seq("c_custkey"), trackedCols = Seq("bal_cents"),
          runStamp = "2024-06-01")
        .orderBy(col("c_custkey"), col("valid_from"))
    },

    // SCD2 point-in-time enrichment — the warehouse READ pattern the
    // SCD2 write exists for: each fact row picks the dimension version
    // valid at its event date. Composes the certified SCD2 build with
    // the certified single-Exchange as-of machinery (versions are
    // contiguous per key, so latest valid_from <= fact date IS the
    // valid version; facts before a key's first version get NULLs).
    // DuckDB's native ASOF LEFT JOIN over the same rebuilt dimension
    // is the oracle.
    "q119_scd2_pointintime" -> { (s, dir) =>
      val cur = base(s, dir)
      val dim = Mutations.scdType2(target2(cur), feed(cur),
        keys = Seq("c_custkey"), trackedCols = Seq("bal_cents"),
        runStamp = "2024-06-01")
      val facts = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") < 10000)
        .select(col("o_orderkey"), col("o_custkey").as("c_custkey"),
          when(col("o_orderkey") % 3 === 0, "2019-06-15")
            .when(col("o_orderkey") % 3 === 1, "2022-01-01")
            .otherwise("2024-12-31").as("fact_date"))
      graft.ops.Joins.asofJoin(facts, dim, Seq("c_custkey"),
          "fact_date", "valid_from",
          select = Seq("bal_cents" -> "bal_at_fact",
            "valid_from" -> "version_from"))
        .orderBy(col("o_orderkey"))
    },

    "q45_scd1" -> { (s, dir) =>
      val cur = base(s, dir)
      // partial feed: only the changed rows and the new keys
      val f = feed(cur).filter(col("c_custkey") % 3 === 0 ||
        col("c_custkey") >= 1000000)
      Mutations.scdType1(cur, f, keys = Seq("c_custkey"))
        .orderBy(col("c_custkey"))
    },

    // The SSIS SCD COMPONENT is a router; q68 certifies the routing
    // itself. Key-derived perturbations exercise every port: %10==3 →
    // new key, ==0 → changing attr, ==1 → historical attr, ==2 →
    // fixed-attr violation, rest unchanged.
    "q68_scd_router" -> { (s, dir) =>
      val dim = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          col("c_nationkey"))
      val k = col("c_custkey")
      val f = dim.select(
        when(k % 10 === 3, k + 1000000).otherwise(k).as("c_custkey"),
        when(k % 10 === 0, concat(col("c_name"), lit("_X")))
          .otherwise(col("c_name")).as("c_name"),
        when(k % 10 === 1, concat(col("c_mktsegment"), lit("_Y")))
          .otherwise(col("c_mktsegment")).as("c_mktsegment"),
        when(k % 10 === 2, col("c_nationkey") + 1)
          .otherwise(col("c_nationkey")).as("c_nationkey"))
      Mutations.scdRoute(f, dim, keys = Seq("c_custkey"),
          changing = Seq("c_name"), historical = Seq("c_mktsegment"),
          fixed = Seq("c_nationkey"))
        .select(col("c_custkey"), col("scd_route"))
        .orderBy(col("c_custkey"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q44_scd2" ->
      """WITH cur AS (
        |  SELECT c_custkey, c_name,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer)
        |SELECT * FROM (
        |  -- history passes through untouched
        |  SELECT c_custkey, c_name, bal_cents - 5 AS bal_cents,
        |    '2019-01-01' AS valid_from, '2019-12-31' AS valid_to,
        |    false AS is_current
        |  FROM cur WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  -- changed keys: expired old version
        |  SELECT c_custkey, c_name, bal_cents,
        |    '2020-01-01', '2024-06-01', false
        |  FROM cur WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  -- unchanged keys: kept current
        |  SELECT c_custkey, c_name, bal_cents,
        |    '2020-01-01', CAST(NULL AS VARCHAR), true
        |  FROM cur WHERE c_custkey % 3 <> 0
        |  UNION ALL
        |  -- changed keys: fresh version
        |  SELECT c_custkey, c_name, bal_cents + 1000,
        |    '2024-06-01', CAST(NULL AS VARCHAR), true
        |  FROM cur WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  -- brand-new business keys
        |  SELECT c_custkey + 1000000, 'new customer', 123,
        |    '2024-06-01', CAST(NULL AS VARCHAR), true
        |  FROM cur WHERE c_custkey % 5 = 0)
        |ORDER BY c_custkey, valid_from""".stripMargin,
    "q119_scd2_pointintime" ->
      """WITH cur AS (
        |  SELECT c_custkey, c_name,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer),
        |dim AS (
        |  SELECT c_custkey, bal_cents - 5 AS bal_cents,
        |    '2019-01-01' AS valid_from
        |  FROM cur WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey, bal_cents, '2020-01-01' FROM cur
        |  UNION ALL
        |  SELECT c_custkey, bal_cents + 1000, '2024-06-01'
        |  FROM cur WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 123, '2024-06-01'
        |  FROM cur WHERE c_custkey % 5 = 0),
        |facts AS (
        |  SELECT o_orderkey, o_custkey AS c_custkey,
        |    CASE WHEN o_orderkey % 3 = 0 THEN '2019-06-15'
        |         WHEN o_orderkey % 3 = 1 THEN '2022-01-01'
        |         ELSE '2024-12-31' END AS fact_date
        |  FROM orders WHERE o_orderkey < 10000)
        |SELECT f.o_orderkey, f.c_custkey, f.fact_date,
        |  d.bal_cents AS bal_at_fact, d.valid_from AS version_from
        |FROM facts f ASOF LEFT JOIN dim d
        |  ON f.c_custkey = d.c_custkey AND f.fact_date >= d.valid_from
        |ORDER BY f.o_orderkey""".stripMargin,
    "q45_scd1" ->
      """WITH cur AS (
        |  SELECT c_custkey, c_name,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer)
        |SELECT c_custkey, c_name,
        |  bal_cents + CASE WHEN c_custkey % 3 = 0 THEN 1000 ELSE 0 END AS bal_cents
        |FROM cur
        |UNION ALL
        |SELECT c_custkey + 1000000, 'new customer', 123
        |FROM cur WHERE c_custkey % 5 = 0
        |ORDER BY c_custkey""".stripMargin,
    "q68_scd_router" ->
      """WITH dim AS (SELECT c_custkey, c_name, c_mktsegment, c_nationkey
        |    FROM customer),
        |f AS (SELECT
        |    CASE WHEN c_custkey % 10 = 3 THEN c_custkey + 1000000
        |      ELSE c_custkey END AS c_custkey,
        |    CASE WHEN c_custkey % 10 = 0 THEN c_name || '_X'
        |      ELSE c_name END AS c_name,
        |    CASE WHEN c_custkey % 10 = 1 THEN c_mktsegment || '_Y'
        |      ELSE c_mktsegment END AS c_mktsegment,
        |    CASE WHEN c_custkey % 10 = 2 THEN c_nationkey + 1
        |      ELSE c_nationkey END AS c_nationkey
        |  FROM dim)
        |SELECT f.c_custkey,
        |  CASE WHEN d.c_custkey IS NULL THEN 'new'
        |    WHEN f.c_nationkey IS DISTINCT FROM d.c_nationkey THEN 'fixedattr'
        |    WHEN f.c_mktsegment IS DISTINCT FROM d.c_mktsegment THEN 'historical'
        |    WHEN f.c_name IS DISTINCT FROM d.c_name THEN 'changed'
        |    ELSE 'unchanged' END AS scd_route
        |FROM f LEFT JOIN dim d ON f.c_custkey = d.c_custkey
        |ORDER BY f.c_custkey""".stripMargin
  )
}
