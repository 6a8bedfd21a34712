package graft.frontend

import org.scalatest.funsuite.AnyFunSuite

/** Name-resolution precedence of the config-driven schema mapping —
  * pinned against the reference mapper's rules
  * (schema_mapper.py:79-131) so a drift in match order (exact key vs
  * bare-name vs schema fallback) fails here, not in a migrated
  * package. */
class SchemaMappingSpec extends AnyFunSuite {

  private val m = SchemaMapping.fromJson(
    """{ "connection_mappings": {
      |  "SRC_OLEDB": {
      |    "databricks_schema": "bronze.src",
      |    "table_mappings": {
      |      "dbo.SRC_InputTable": "src_inputtable",
      |      "dbo.Pinned": "other_schema.pinned_elsewhere" } },
      |  "LKP_OLEDB": {
      |    "databricks_schema": "bronze.lkp",
      |    "table_mappings": { "dbo.LKP_CategoryTable": "lkp_categorytable" } },
      |  "NO_SCHEMA": { "table_mappings": { "dbo.Bare": "bare_mapped" } }
      |} }""".stripMargin)

  test("exact key match, schema prefix applied") {
    assert(m.mapTable("SRC_OLEDB", "dbo.SRC_InputTable") ==
      "bronze.src.src_inputtable")
  }

  test("bracket and bare-name forms hit the same mapping") {
    assert(m.mapTable("SRC_OLEDB", "[dbo].[SRC_InputTable]") ==
      "bronze.src.src_inputtable")
    assert(m.mapTable("SRC_OLEDB", "SRC_InputTable") ==
      "bronze.src.src_inputtable")
  }

  test("already-qualified mapped value wins as-is") {
    assert(m.mapTable("SRC_OLEDB", "dbo.Pinned") ==
      "other_schema.pinned_elsewhere")
  }

  test("unmapped table falls back to connection schema + bare name") {
    assert(m.mapTable("SRC_OLEDB", "dbo.Unlisted") == "bronze.src.Unlisted")
  }

  test("connection lookup is case-insensitive; unknown passes through") {
    assert(m.mapTable("src_oledb", "SRC_InputTable") ==
      "bronze.src.src_inputtable")
    assert(m.mapTable("UNKNOWN_CONN", "dbo.X") == "dbo.X")
  }

  test("schema-less connection maps the table name alone") {
    assert(m.mapTable("NO_SCHEMA", "dbo.Bare") == "bare_mapped")
  }

  test("connection inference finds the first owner, else passes through") {
    assert(m.mapTable("LKP_CategoryTable") == "bronze.lkp.lkp_categorytable")
    assert(m.mapTable("nowhere_to_be_found") == "nowhere_to_be_found")
  }

  test("SQL rewrite covers bracketed, qualified, and bare references") {
    val sql = "SELECT COUNT(*) FROM [dbo].[SRC_InputTable] s " +
      "JOIN dbo.LKP_CategoryTable c ON s.k = c.k " +
      "WHERE SRC_InputTable.x > 0"
    val out = m.applyToSql(sql)
    assert(out.contains("FROM bronze.src.src_inputtable s"))
    assert(out.contains("JOIN bronze.lkp.lkp_categorytable c"))
    assert(out.contains("WHERE bronze.src.src_inputtable.x > 0"))
  }

  test("SQL rewrite leaves unmapped identifiers and superstrings alone") {
    val out = m.applyToSql(
      "SELECT * FROM Unmapped_Table, SRC_InputTable_Archive")
    assert(out == "SELECT * FROM Unmapped_Table, SRC_InputTable_Archive")
  }
}
