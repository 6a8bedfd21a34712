package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expr.ssis

/** Row-wise transformation operators (SURVEY §2.3), driven through the
  * SSIS expression compiler — each query IS a Derived Column / Data
  * Conversion / Copy Column / Character Map / Checksum instance.
  */
object TransformQueries extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Derived Column (reference: enhanced_json_mapper.py:1806-1843) — the
    // expressions below go through graft.expr, incl. a nested ternary the
    // reference's regex translator cannot handle.
    "q4_derived_column" -> { (s, dir) =>
      val df = Tables.load(s, dir, "part")
      df.select(
        col("p_partkey"),
        ssis(df, "UPPER(SUBSTRING([p_name], 1, 8))").as("name_prefix"),
        ssis(df, "[p_size] > 25 ? \"BIG\" : [p_size] > 10 ? \"MED\" : \"SMALL\"").as("size_class"),
        ssis(df, "FINDSTRING([p_type], \"PROMO\", 1)").as("promo_pos"),
        ssis(df, "(DT_I4)([p_size] * 2 + LEN([p_name]))").as("derived_code"),
        ssis(df, "REPLACE([p_brand], \"#\", \"-\")").as("brand_norm"),
        ssis(df, "[p_type] + \"/\" + [p_brand]").as("type_brand"))
        .orderBy(col("p_partkey"))
    },

    // Data Conversion (reference: data_engineering_parser.py:1173-1178).
    // price_dec runs the DT_NUMERIC(18,2) conversion then surfaces as
    // DOUBLE: the decimal result is bit-identical to the oracle's, but
    // the driver's hasher mishandles decimal physical types — both
    // engines convert the same scaled integer, so the doubles agree
    // exactly (int64→double is exact, one correctly-rounded divide).
    "q5_data_conversion" -> { (s, dir) =>
      val df = Tables.load(s, dir, "lineitem")
      df.select(
        col("l_orderkey"),
        col("l_linenumber"),
        ssis(df, "(DT_I4)[l_quantity]").as("qty_int"),
        ssis(df, "(DT_NUMERIC, 18, 2)[l_extendedprice]")
          .cast("double").as("price_dec"),
        ssis(df, "(DT_STR, 50, 1252)[l_orderkey]").as("orderkey_str"),
        ssis(df, "(DT_DBDATE)[l_shipdate]").as("ship_date"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Copy Column + Character Map (reference: data_engineering_parser.py:1090-1091)
    "q6_copy_charmap" -> { (s, dir) =>
      val df = Tables.load(s, dir, "customer")
      df.select(
        col("c_custkey"),
        col("c_name"),
        col("c_name").as("c_name_copy"),
        ssis(df, "LOWER([c_mktsegment])").as("segment_lower"),
        ssis(df, "TRIM(UPPER([c_name]))").as("name_upper"))
        .orderBy(col("c_custkey"))
    },

    // Checksum for change detection, SSIS-additive form as in the fixture
    // (Sample_Medium_Package.dtsx:326-331); engine also ships murmur3
    // `hash` for the scalable variant (not oracle-matchable).
    "q7_checksum" -> { (s, dir) =>
      val df = Tables.load(s, dir, "supplier")
      df.select(
        col("s_suppkey"),
        ssis(df, "(DT_I4)([s_suppkey] + [s_nationkey] + LEN([s_name]))").as("check_sum"),
        ssis(df, "ISNULL([s_acctbal]) == TRUE ? 0.0 : [s_acctbal]").as("acctbal_patched"))
        .orderBy(col("s_suppkey"))
    },

    // Audit columns (reference: data_engineering_parser.py:1123,1235-1236) —
    // deterministic audit values only (timestamps would break the oracle).
    "q8_audit" -> { (s, dir) =>
      val df = Tables.load(s, dir, "region")
      df.select(
        col("r_regionkey"), col("r_name"),
        lit("graft-run").as("audit_run_id"),
        lit(1).as("audit_task_id"),
        ssis(df, "@[System::PackageName]", Map("System::PackageName" -> "pkg_region")).as("audit_package"))
        .orderBy(col("r_regionkey"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q4_derived_column" ->
      """SELECT p_partkey,
        |  UPPER(SUBSTRING(p_name, 1, 8)) AS name_prefix,
        |  CASE WHEN p_size > 25 THEN 'BIG' WHEN p_size > 10 THEN 'MED' ELSE 'SMALL' END AS size_class,
        |  CAST(strpos(p_type, 'PROMO') AS INTEGER) AS promo_pos,
        |  CAST(p_size * 2 + LENGTH(p_name) AS INTEGER) AS derived_code,
        |  REPLACE(p_brand, '#', '-') AS brand_norm,
        |  p_type || '/' || p_brand AS type_brand
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q5_data_conversion" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS INTEGER) AS qty_int,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
        |  CAST(l_orderkey AS VARCHAR) AS orderkey_str,
        |  CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q6_copy_charmap" ->
      """SELECT c_custkey, c_name, c_name AS c_name_copy,
        |  LOWER(c_mktsegment) AS segment_lower,
        |  TRIM(UPPER(c_name)) AS name_upper
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q7_checksum" ->
      """SELECT s_suppkey,
        |  CAST(s_suppkey + s_nationkey + LENGTH(s_name) AS INTEGER) AS check_sum,
        |  CASE WHEN s_acctbal IS NULL THEN 0.0 ELSE s_acctbal END AS acctbal_patched
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q8_audit" ->
      """SELECT r_regionkey, r_name,
        |  'graft-run' AS audit_run_id,
        |  1 AS audit_task_id,
        |  'pkg_region' AS audit_package
        |FROM region ORDER BY r_regionkey""".stripMargin
  )
}
