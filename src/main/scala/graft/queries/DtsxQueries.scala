package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dag.{ControlFlowExec, PipelineContext}
import graft.frontend.Dtsx

/** The dtsx frontend under the driver's oracle gate: q51 builds the
  * medium fixture's catalog tables deterministically from testdata
  * (nation x region), executes the reference's ACTUAL
  * Sample_Medium_Package.dtsx through parse -> ControlFlowExec, and
  * returns the staged UPDATE-command table. The DuckDB oracle
  * re-implements the package's full semantics (lookup chain, checksum,
  * full-outer merge join, null sentinels, first-match-wins 5-way split)
  * as one SQL query over the same derivations — any parser or executor
  * drift shows up as a hash mismatch.
  */
object DtsxQueries extends QueryPack {

  private val PackagePath =
    "/root/reference/input-sample packages/Sample_Medium_Package.dtsx"

  /** A designer-shaped package exercising the SSIS Aggregate's
    * multiple-aggregation-outputs feature (r5 verdict item 3): ONE
    * Aggregate component, TWO independent group-bys over the shared
    * (persisted-once) input, each routed to its own destination.
    * AggregationType enum per the designer: 0=GroupBy, 2=CountAll,
    * 4=Sum. */
  private val MultiAggXml =
    <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="magg71">
      <DTS:Executables>
        <DTS:Executable DTS:ObjectName="DFT" DTS:ExecutableType="Microsoft.Pipeline">
          <DTS:ObjectData>
            <pipeline>
              <components>
                <component componentClassID="Microsoft.OLEDBSource" name="S">
                  <properties>
                    <property name="SqlCommand">SELECT g, v FROM magg71_src</property>
                    <property name="AccessMode">2</property>
                  </properties>
                  <outputs>
                    <output name="Out">
                      <outputColumns>
                        <outputColumn name="g"/>
                        <outputColumn name="v"/>
                      </outputColumns>
                    </output>
                  </outputs>
                </component>
                <component componentClassID="Microsoft.Aggregate" name="AGG">
                  <outputs>
                    <output name="By G">
                      <outputColumns>
                        <outputColumn name="g">
                          <properties><property name="AggregationType">0</property></properties>
                        </outputColumn>
                        <outputColumn name="sv">
                          <properties>
                            <property name="AggregationType">4</property>
                            <property name="AggregationColumnId">#{{P\DFT\AGG.Inputs[In].Columns[v]}}</property>
                          </properties>
                        </outputColumn>
                        <outputColumn name="cnt">
                          <properties><property name="AggregationType">2</property></properties>
                        </outputColumn>
                      </outputColumns>
                    </output>
                    <output name="Total">
                      <outputColumns>
                        <outputColumn name="n">
                          <properties><property name="AggregationType">2</property></properties>
                        </outputColumn>
                        <outputColumn name="tv">
                          <properties>
                            <property name="AggregationType">4</property>
                            <property name="AggregationColumnId">#{{P\DFT\AGG.Inputs[In].Columns[v]}}</property>
                          </properties>
                        </outputColumn>
                      </outputColumns>
                    </output>
                  </outputs>
                </component>
                <component componentClassID="Microsoft.OLEDBDestination" name="D_G">
                  <properties>
                    <property name="OpenRowset">magg71_g</property>
                    <property name="AccessMode">3</property>
                  </properties>
                </component>
                <component componentClassID="Microsoft.OLEDBDestination" name="D_T">
                  <properties>
                    <property name="OpenRowset">magg71_t</property>
                    <property name="AccessMode">3</property>
                  </properties>
                </component>
              </components>
              <paths>
                <path startId="P\DFT\S.Outputs[Out]" endId="P\DFT\AGG.Inputs[In]"/>
                <path startId="P\DFT\AGG.Outputs[By G]" endId="P\DFT\D_G.Inputs[In]"/>
                <path startId="P\DFT\AGG.Outputs[Total]" endId="P\DFT\D_T.Inputs[In]"/>
              </paths>
            </pipeline>
          </DTS:ObjectData>
        </DTS:Executable>
      </DTS:Executables>
    </DTS:Executable>

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Multi-output Aggregate package end-to-end: customer cents per
    // market segment AND a grand total, from one component. Both
    // destination tables are combined (total tagged '__ALL__') so the
    // two-query DuckDB oracle certifies both outputs.
    "q71_dtsx_multiagg" -> { (s, dir) =>
      Tables.load(s, dir, "customer")
        .select(col("c_mktsegment").as("g"),
          round(col("c_acctbal") * 100).cast("int").as("v"))
        .write.mode("overwrite").saveAsTable("magg71_src")
      s.sql("DROP TABLE IF EXISTS magg71_g")
      s.sql("DROP TABLE IF EXISTS magg71_t")
      s.sql("CREATE TABLE magg71_g (g STRING, sv BIGINT, cnt BIGINT) USING parquet")
      s.sql("CREATE TABLE magg71_t (n BIGINT, tv BIGINT) USING parquet")
      ControlFlowExec.run(Dtsx.parse(MultiAggXml),
        PipelineContext.overCatalog(s))
      s.table("magg71_g")
        .unionByName(s.table("magg71_t")
          .select(lit("__ALL__").as("g"), col("tv").as("sv"),
            col("n").as("cnt")))
        .orderBy(col("g"))
    },

    "q51_dtsx_medium" -> { (s, dir) =>
      val n = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").cast("int").as("n"), col("n_name"))
      val r = Tables.load(s, dir, "region")
        .select(col("r_regionkey").cast("int").as("r"))
      val grid = n.crossJoin(r)

      grid.select((lit(100) + col("r")).as("CategoryCode"),
          col("n_name").as("CountryCode"),
          concat(lit("desc_"), col("n")).as("Status"))
        .write.mode("overwrite").saveAsTable("SRC_InputTable")
      n.select((col("n") + 1000).as("LocalCategoryID"),
          concat(lit("desc_"), col("n")).as("CategoryDescription"))
        .write.mode("overwrite").saveAsTable("LKP_LocalCategoryTable")
      r.select(col("r").as("CategoryID"), (col("r") + 100).as("CategoryCode"))
        .write.mode("overwrite").saveAsTable("LKP_CategoryTable")
      n.select(col("n").as("CountryID"), col("n_name").as("CountryCode"))
        .write.mode("overwrite").saveAsTable("LKP_CountryTable")
      // existing table: 2/3 of the grid (some matching checksums, some
      // stale), plus the default row and one key outside the feed
      val existing = grid.filter((col("n") + col("r")) % 3 =!= 2)
        .select(col("n").as("CountryID"), col("r").as("CategoryID"),
          when((col("n") + col("r")) % 2 === 0,
            lit(1000) + col("n") * 2 + col("r")).otherwise(lit(999))
            .as("ETLCheckSum"),
          when(col("n") % 4 === 0, 1).otherwise(0).as("DeletedFlag"))
        .unionByName(s.range(1).select(lit(-1).as("CountryID"),
          lit(0).as("CategoryID"), lit(77).as("ETLCheckSum"),
          lit(0).as("DeletedFlag")))
        .unionByName(s.range(1).select(lit(999).as("CountryID"),
          lit(999).as("CategoryID"), lit(555).as("ETLCheckSum"),
          lit(0).as("DeletedFlag")))
      existing.write.mode("overwrite").saveAsTable("DST_GenericTable")
      s.sql("DROP TABLE IF EXISTS sp_GenericUpdate_calls")
      s.sql("DROP TABLE IF EXISTS sp_GenericHardDelete_calls")

      val spec = Dtsx.parseFile(PackagePath)
      ControlFlowExec.run(spec, PipelineContext.overCatalog(s))

      s.table("sp_GenericUpdate_calls")
        .orderBy(col("CountryID_OLD"), col("CategoryID_OLD"),
          col("LocalCategoryID"), col("CheckSum_New"))
    },

    // The SAME reference package, run against a RENAMED catalog through
    // a user-supplied schema-mapping file (r13 verdict item 3 — parity
    // with the reference's schema_mapper.py + template JSON): every
    // fixture table lives ONLY under its mapped bronze/silver name, the
    // package is untouched, and the mapping file drives resolveTable /
    // writeTable plus a raw-SQL rewrite for the statements that never
    // pass through them (Execute SQL COUNT, lookup SqlCommands). The
    // staged UPDATE table — read back from its MAPPED name — must hash-
    // match the exact oracle q51 uses; any name that leaked through
    // unmapped fails the run (the unmapped tables don't exist).
    "q174_dtsx_schema_mapped" -> { (s, dir) =>
      import graft.frontend.SchemaMapping
      val n = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").cast("int").as("n"), col("n_name"))
      val r = Tables.load(s, dir, "region")
        .select(col("r_regionkey").cast("int").as("r"))
      val grid = n.crossJoin(r)

      s.sql("CREATE DATABASE IF NOT EXISTS bronze")
      s.sql("CREATE DATABASE IF NOT EXISTS silver")
      grid.select((lit(100) + col("r")).as("CategoryCode"),
          col("n_name").as("CountryCode"),
          concat(lit("desc_"), col("n")).as("Status"))
        .write.mode("overwrite").saveAsTable("bronze.src_inputtable")
      n.select((col("n") + 1000).as("LocalCategoryID"),
          concat(lit("desc_"), col("n")).as("CategoryDescription"))
        .write.mode("overwrite").saveAsTable("bronze.lkp_localcategorytable")
      r.select(col("r").as("CategoryID"), (col("r") + 100).as("CategoryCode"))
        .write.mode("overwrite").saveAsTable("bronze.lkp_categorytable")
      n.select(col("n").as("CountryID"), col("n_name").as("CountryCode"))
        .write.mode("overwrite").saveAsTable("bronze.lkp_countrytable")
      val existing = grid.filter((col("n") + col("r")) % 3 =!= 2)
        .select(col("n").as("CountryID"), col("r").as("CategoryID"),
          when((col("n") + col("r")) % 2 === 0,
            lit(1000) + col("n") * 2 + col("r")).otherwise(lit(999))
            .as("ETLCheckSum"),
          when(col("n") % 4 === 0, 1).otherwise(0).as("DeletedFlag"))
        .unionByName(s.range(1).select(lit(-1).as("CountryID"),
          lit(0).as("CategoryID"), lit(77).as("ETLCheckSum"),
          lit(0).as("DeletedFlag")))
        .unionByName(s.range(1).select(lit(999).as("CountryID"),
          lit(999).as("CategoryID"), lit(555).as("ETLCheckSum"),
          lit(0).as("DeletedFlag")))
      existing.write.mode("overwrite").saveAsTable("silver.dst_generictable")
      s.sql("DROP TABLE IF EXISTS silver.sp_genericupdate_calls")
      s.sql("DROP TABLE IF EXISTS silver.sp_genericharddelete_calls")

      // the mapping FILE a migration user would write — the reference's
      // schema_mapping_template.json shape, loaded from disk
      val mappingJson =
        """{ "connection_mappings": {
          |  "SRC_OLEDB": {
          |    "databricks_schema": "bronze",
          |    "table_mappings": { "dbo.SRC_InputTable": "src_inputtable" } },
          |  "LKP_OLEDB": {
          |    "databricks_schema": "bronze",
          |    "table_mappings": {
          |      "dbo.LKP_CategoryTable": "lkp_categorytable",
          |      "dbo.LKP_CountryTable": "lkp_countrytable",
          |      "dbo.LKP_LocalCategoryTable": "lkp_localcategorytable" } },
          |  "DBX_Output": {
          |    "databricks_schema": "silver",
          |    "table_mappings": {
          |      "dbo.DST_GenericTable": "dst_generictable",
          |      "sp_GenericUpdate_calls": "sp_genericupdate_calls",
          |      "sp_GenericHardDelete_calls": "sp_genericharddelete_calls" } }
          |} }""".stripMargin
      val mapFile = java.nio.file.Files.createTempFile("schema_mapping",
        ".json")
      java.nio.file.Files.write(mapFile, mappingJson.getBytes("UTF-8"))
      val mapping = SchemaMapping.load(mapFile.toString)

      val spec = mapping.rewrite(Dtsx.parseFile(PackagePath))
      ControlFlowExec.run(spec,
        mapping.context(PipelineContext.overCatalog(s)))

      s.table("silver.sp_genericupdate_calls")
        .orderBy(col("CountryID_OLD"), col("CategoryID_OLD"),
          col("LocalCategoryID"), col("CheckSum_New"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q71_dtsx_multiagg" ->
      """WITH src AS (SELECT c_mktsegment AS g,
        |    CAST(round(c_acctbal * 100) AS INT) AS v FROM customer)
        |SELECT g, CAST(SUM(v) AS BIGINT) AS sv, COUNT(*) AS cnt FROM src GROUP BY g
        |UNION ALL
        |SELECT '__ALL__' AS g, CAST(SUM(v) AS BIGINT) AS sv, COUNT(*) AS cnt FROM src
        |ORDER BY g""".stripMargin,
    "q51_dtsx_medium" -> mediumStagedSql,
    // identical semantics, renamed physical catalog: the mapping layer
    // must be invisible in the data
    "q174_dtsx_schema_mapped" -> mediumStagedSql
  )

  private lazy val mediumStagedSql: String =
      """WITH n AS (SELECT CAST(n_nationkey AS INT) AS n, n_name FROM nation),
        |r AS (SELECT CAST(r_regionkey AS INT) AS r FROM region),
        |feed AS (
        |  SELECT n.n, r.r, 1000 + n.n AS local_id,
        |    1000 + 2 * n.n + r.r AS cs_new
        |  FROM n CROSS JOIN r),
        |dst AS (
        |  SELECT n AS dn, r AS dr,
        |    CASE WHEN (n + r) % 2 = 0 THEN 1000 + 2 * n + r ELSE 999 END AS ets
        |  FROM feed WHERE (n + r) % 3 <> 2
        |  UNION ALL SELECT -1, 0, 77
        |  UNION ALL SELECT 999, 999, 555),
        |joined AS (
        |  SELECT f.n AS fn, f.local_id, f.cs_new, d.dn, d.dr, d.ets
        |  FROM feed f FULL JOIN dst d ON f.n = d.dn AND f.r = d.dr)
        |SELECT -1 AS WorkHistoryID,
        |  CASE WHEN fn IS NULL THEN NULL ELSE 0 END AS DeletedFlag,
        |  CASE WHEN fn IS NULL THEN NULL ELSE 0 END AS TemplateFlag,
        |  dn AS CountryID_OLD, dr AS CategoryID_OLD,
        |  local_id AS LocalCategoryID,
        |  CASE WHEN fn IS NULL THEN -1 ELSE cs_new END AS CheckSum_New
        |FROM joined
        |WHERE NOT coalesce(dn IN (-1, -2), false)
        |  AND coalesce(cs_new, -1) <> coalesce(ets, -1)
        |ORDER BY CountryID_OLD NULLS FIRST, CategoryID_OLD NULLS FIRST,
        |  LocalCategoryID NULLS FIRST, CheckSum_New""".stripMargin
}
