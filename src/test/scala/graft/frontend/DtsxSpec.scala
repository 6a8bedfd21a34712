package graft.frontend

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.dag.{ControlFlowExec, PipelineContext}
import graft.ir.CfTask

/** End-to-end parity: parse the reference's OWN fixture packages
  * (both .dtsx files under "input-sample packages") and execute them on
  * the engine against catalog tables, asserting row routing, row-count
  * variables, and destination contents. */
class DtsxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val fixtures = "/root/reference/input-sample packages"

  private def sql(statements: String*): Unit = statements.foreach(spark.sql(_))

  test("Sample_Simple_Package: truncate -> load -> defaults") {
    sql(
      "DROP TABLE IF EXISTS SRC_InputTable",
      "DROP TABLE IF EXISTS SRC_GenericTable",
      """CREATE TABLE SRC_InputTable (ID INT, Name STRING, Value DOUBLE, Status STRING)
        |USING parquet""".stripMargin,
      """INSERT INTO SRC_InputTable VALUES
        |(1, 'one', 1.5, 'OK'), (2, 'two', 2.5, 'OK'), (3, 'three', 0.0, 'BAD')""".stripMargin,
      "CREATE TABLE SRC_GenericTable (ID INT, Name STRING, Value DOUBLE, Status STRING) USING parquet",
      "INSERT INTO SRC_GenericTable VALUES (99, 'stale', 9.9, 'OLD')")

    val spec = Dtsx.parseFile(s"$fixtures/Sample_Simple_Package.dtsx")
    assert(spec.tasks.map(_.name) ==
      Seq("SQL TRUNCATE SRC_GenericTable", "DFT_Load", "SQL Add defaults"))
    val res = ControlFlowExec.run(spec, PipelineContext.overCatalog(spark))

    assert(res.statuses.values.forall(_ == ControlFlowExec.Succeeded), res.statuses)
    // truncate removed the stale row; 3 loaded + 2 defaults inserted
    assert(spark.table("SRC_GenericTable").count() == 5)
    assert(res.variables("User::VAR_RowCount") == 3L)
  }

  test("synthetic package: connected no-match output upgrades Lookup to Redirect; error outputs filtered") {
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="synth">
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="DFT" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.OLEDBSource" name="SRC">
                    <properties>
                      <property name="SqlCommand">SELECT k, payload FROM synth_stream</property>
                      <property name="AccessMode">2</property>
                    </properties>
                    <outputs>
                      <output name="Out">
                        <outputColumns>
                          <outputColumn name="k"/>
                          <outputColumn name="payload"/>
                        </outputColumns>
                      </output>
                      <output name="Err" isErrorOut="true">
                        <outputColumns>
                          <outputColumn name="ErrorCode"/>
                          <outputColumn name="ErrorColumn"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.Lookup" name="LKP">
                    <properties>
                      <property name="SqlCommand">SELECT rk, rv FROM synth_ref</property>
                      <property name="CacheType">0</property>
                      <property name="NoMatchBehavior">1</property>
                    </properties>
                    <inputs>
                      <input name="Lookup Input">
                        <inputColumns>
                          <inputColumn cachedName="k">
                            <properties>
                              <property name="JoinToReferenceColumn">rk</property>
                            </properties>
                          </inputColumn>
                        </inputColumns>
                      </input>
                    </inputs>
                    <outputs>
                      <output name="Lookup Match Output">
                        <outputColumns>
                          <outputColumn name="rv">
                            <properties>
                              <property name="CopyFromReferenceColumn">rv</property>
                            </properties>
                          </outputColumn>
                        </outputColumns>
                      </output>
                      <output name="Lookup No Match Output"/>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="DST_M">
                    <properties>
                      <property name="OpenRowset">matched_t</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="DST_N">
                    <properties>
                      <property name="OpenRowset">nomatch_t</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT\SRC.Outputs[Out]" endId="P\DFT\LKP.Inputs[Lookup Input]"/>
                  <path startId="P\DFT\LKP.Outputs[Lookup Match Output]" endId="P\DFT\DST_M.Inputs[In]"/>
                  <path startId="P\DFT\LKP.Outputs[Lookup No Match Output]" endId="P\DFT\DST_N.Inputs[In]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    sql(
      "DROP TABLE IF EXISTS synth_stream", "DROP TABLE IF EXISTS synth_ref",
      "DROP TABLE IF EXISTS matched_t", "DROP TABLE IF EXISTS nomatch_t",
      "CREATE TABLE synth_stream (k INT, payload STRING) USING parquet",
      "INSERT INTO synth_stream VALUES (1, 'a'), (2, 'b'), (3, 'c')",
      "CREATE TABLE synth_ref (rk INT, rv STRING) USING parquet",
      "INSERT INTO synth_ref VALUES (1, 'one'), (3, 'three')")
    val spec = Dtsx.parse(xml)
    // the error output's ErrorCode/ErrorColumn must not leak into the
    // source's positional rename
    val res = ControlFlowExec.run(spec, PipelineContext.overCatalog(spark))
    assert(res.statuses.values.forall(_ == ControlFlowExec.Succeeded), res.statuses)
    assert(spark.table("matched_t").count() == 2)
    assert(spark.table("nomatch_t").select("k").collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("synthetic package: Merge, Multicast, UnionAll, DataConvert, managed RowCount/Trash") {
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="wide">
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="DFT" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.OLEDBSource" name="SRC1">
                    <properties>
                      <property name="SqlCommand">SELECT k, v FROM mc_src WHERE k &lt;= 2</property>
                      <property name="AccessMode">2</property>
                    </properties>
                    <outputs>
                      <output name="Out">
                        <outputColumns>
                          <outputColumn name="k"/>
                          <outputColumn name="v"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.OLEDBSource" name="SRC2">
                    <properties>
                      <property name="SqlCommand">SELECT k, v FROM mc_src WHERE k &gt;= 3</property>
                      <property name="AccessMode">2</property>
                    </properties>
                    <outputs>
                      <output name="Out">
                        <outputColumns>
                          <outputColumn name="k"/>
                          <outputColumn name="v"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.Merge" name="MRG">
                    <inputs>
                      <input name="Merge Input 1">
                        <inputColumns>
                          <inputColumn cachedName="k" cachedSortKeyPosition="1"/>
                          <inputColumn cachedName="v"/>
                        </inputColumns>
                      </input>
                      <input name="Merge Input 2">
                        <inputColumns>
                          <inputColumn cachedName="k" cachedSortKeyPosition="1"/>
                          <inputColumn cachedName="v"/>
                        </inputColumns>
                      </input>
                    </inputs>
                  </component>
                  <component componentClassID="Microsoft.Multicast" name="MC">
                    <outputs>
                      <output name="Multicast Output 1"/>
                      <output name="Multicast Output 2"/>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.DataConvert" name="DC">
                    <outputs>
                      <output name="Data Conversion Output">
                        <outputColumns>
                          <outputColumn name="k_str" dataType="str" length="10" codePage="1252">
                            <properties>
                              <property name="SourceInputColumnLineageId">#{{P\DFT\MRG.Outputs[Merge Output].Columns[k]}}</property>
                            </properties>
                          </outputColumn>
                        </outputColumns>
                      </output>
                      <output name="Err" isErrorOut="true">
                        <outputColumns>
                          <outputColumn name="ErrorCode"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="DST_A">
                    <properties>
                      <property name="OpenRowset">conv_t</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                  <component componentClassID="Microsoft.ManagedComponentHost" name="RC">
                    <properties>
                      <property name="UserComponentTypeName">Acme.Pipeline.RowCountTask, Acme</property>
                      <property name="VariableName">User::MCount</property>
                    </properties>
                  </component>
                  <component componentClassID="Microsoft.UnionAll" name="UA"/>
                  <component componentClassID="Microsoft.ManagedComponentHost" name="TRASH">
                    <properties>
                      <property name="UserComponentTypeName">Acme.Pipeline.TrashDestination, Acme</property>
                    </properties>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT\SRC1.Outputs[Out]" endId="P\DFT\MRG.Inputs[Merge Input 1]"/>
                  <path startId="P\DFT\SRC2.Outputs[Out]" endId="P\DFT\MRG.Inputs[Merge Input 2]"/>
                  <path startId="P\DFT\MRG.Outputs[Merge Output]" endId="P\DFT\MC.Inputs[Multicast Input 1]"/>
                  <path startId="P\DFT\MC.Outputs[Multicast Output 1]" endId="P\DFT\DC.Inputs[Data Conversion Input]"/>
                  <path startId="P\DFT\DC.Outputs[Data Conversion Output]" endId="P\DFT\DST_A.Inputs[In]"/>
                  <path startId="P\DFT\MC.Outputs[Multicast Output 2]" endId="P\DFT\RC.Inputs[Row Count Input 1]"/>
                  <path startId="P\DFT\RC.Outputs[Row Count Output 1]" endId="P\DFT\UA.Inputs[Union All Input 1]"/>
                  <path startId="P\DFT\UA.Outputs[Union All Output 1]" endId="P\DFT\TRASH.Inputs[Trash Input]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    sql(
      "DROP TABLE IF EXISTS mc_src", "DROP TABLE IF EXISTS conv_t",
      "CREATE TABLE mc_src (k INT, v STRING) USING parquet",
      "INSERT INTO mc_src VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')",
      "CREATE TABLE conv_t (k INT, v STRING, k_str STRING) USING parquet")
    val res = ControlFlowExec.run(Dtsx.parse(xml),
      PipelineContext.overCatalog(spark))
    assert(res.statuses.values.forall(_ == ControlFlowExec.Succeeded), res.statuses)
    val conv = spark.table("conv_t").collect()
      .map(r => (r.getInt(0), r.getString(2))).toSet
    assert(conv == Set((1, "1"), (2, "2"), (3, "3"), (4, "4")))
    // the managed RowCount's only downstream is a trash — count fallback
    assert(res.variables("User::MCount") == 4L)
  }

  test("synthetic package: flat-file source/destination via connection managers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dtsx_ff")
    dir.toFile.deleteOnExit()
    val inPath = dir.resolve("in.csv").toString
    val outPath = dir.resolve("out_csv").toString
    // pipe-separated with header; TextQualifier quotes the second field
    java.nio.file.Files.write(java.nio.file.Paths.get(inPath),
      "id|name\n1|\"x|y\"\n2|plain\n".getBytes("UTF-8"))
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="ff">
        <DTS:ConnectionManagers>
          <DTS:ConnectionManager DTS:ObjectName="FF_IN" DTS:CreationName="FLATFILE">
            <DTS:ObjectData>
              <DTS:ConnectionManager DTS:ConnectionString={inPath}
                  DTS:Format="Delimited" DTS:ColumnNamesInFirstDataRow="True"
                  DTS:TextQualifier="_x0022_">
                <DTS:FlatFileColumns>
                  <DTS:FlatFileColumn DTS:ObjectName="id" DTS:ColumnDelimiter="_x007C_"/>
                  <DTS:FlatFileColumn DTS:ObjectName="name" DTS:ColumnDelimiter="_x000D__x000A_"/>
                </DTS:FlatFileColumns>
              </DTS:ConnectionManager>
            </DTS:ObjectData>
          </DTS:ConnectionManager>
          <DTS:ConnectionManager DTS:ObjectName="FF_OUT" DTS:CreationName="FLATFILE">
            <DTS:ObjectData>
              <DTS:ConnectionManager DTS:ConnectionString={outPath}
                  DTS:Format="Delimited" DTS:ColumnNamesInFirstDataRow="True">
                <DTS:FlatFileColumns>
                  <DTS:FlatFileColumn DTS:ObjectName="id" DTS:ColumnDelimiter="_x002C_"/>
                </DTS:FlatFileColumns>
              </DTS:ConnectionManager>
            </DTS:ObjectData>
          </DTS:ConnectionManager>
        </DTS:ConnectionManagers>
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="DFT" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.FlatFileSource" name="FFSRC">
                    <connections>
                      <connection connectionManagerID="Package.ConnectionManagers[FF_IN]"/>
                    </connections>
                    <outputs>
                      <output name="Flat File Source Output">
                        <outputColumns>
                          <outputColumn name="id" dataType="i4"/>
                          <outputColumn name="name" dataType="wstr" length="50"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.FlatFileDestination" name="FFDST">
                    <properties>
                      <property name="Overwrite">true</property>
                    </properties>
                    <connections>
                      <connection connectionManagerID="Package.ConnectionManagers[FF_OUT]"/>
                    </connections>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT\FFSRC.Outputs[Flat File Source Output]" endId="P\DFT\FFDST.Inputs[In]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    val res = ControlFlowExec.run(Dtsx.parse(xml),
      PipelineContext.overCatalog(spark))
    assert(res.statuses.values.forall(_ == ControlFlowExec.Succeeded), res.statuses)
    // read back what the destination wrote: comma-separated, header on
    val back = spark.read.options(Map("header" -> "true", "sep" -> ","))
      .schema("id INT, name STRING").csv(outPath).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(back == Set((1, "x|y"), (2, "plain")))
  }

  test("synthetic package: excel source/destination via EXCEL connection manager") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dtsx_xl")
    dir.toFile.deleteOnExit()
    val xlPath = dir.resolve("book.xlsx").toString
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="xl">
        <DTS:ConnectionManagers>
          <DTS:ConnectionManager DTS:ObjectName="XL_CM" DTS:CreationName="EXCEL">
            <DTS:ObjectData>
              <DTS:ConnectionManager DTS:ConnectionString={
                s"Provider=Microsoft.ACE.OLEDB.12.0;Data Source=$xlPath;Extended Properties=Excel 12.0 XML"}/>
            </DTS:ObjectData>
          </DTS:ConnectionManager>
        </DTS:ConnectionManagers>
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="DFT_W" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.OLEDBSource" name="S">
                    <properties>
                      <property name="SqlCommand">SELECT k, v FROM xl_src</property>
                      <property name="AccessMode">2</property>
                    </properties>
                    <outputs>
                      <output name="Out">
                        <outputColumns>
                          <outputColumn name="k"/>
                          <outputColumn name="v"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.ExcelDestination" name="XD">
                    <properties>
                      <property name="OpenRowset">Data$</property>
                    </properties>
                    <connections>
                      <connection connectionManagerID="Package.ConnectionManagers[XL_CM]"/>
                    </connections>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT_W\S.Outputs[Out]" endId="P\DFT_W\XD.Inputs[In]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
          <DTS:Executable DTS:ObjectName="DFT_R" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.ExcelSource" name="XS">
                    <properties>
                      <property name="OpenRowset">Data$</property>
                    </properties>
                    <connections>
                      <connection connectionManagerID="Package.ConnectionManagers[XL_CM]"/>
                    </connections>
                    <outputs>
                      <output name="Excel Source Output">
                        <outputColumns>
                          <outputColumn name="k" dataType="i4"/>
                          <outputColumn name="v" dataType="wstr" length="50"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="D">
                    <properties>
                      <property name="OpenRowset">xl_out</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT_R\XS.Outputs[Excel Source Output]" endId="P\DFT_R\D.Inputs[In]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
        </DTS:Executables>
        <DTS:PrecedenceConstraints>
          <DTS:PrecedenceConstraint DTS:From="xl\DFT_W" DTS:To="xl\DFT_R"/>
        </DTS:PrecedenceConstraints>
      </DTS:Executable>
    sql(
      "DROP TABLE IF EXISTS xl_src", "DROP TABLE IF EXISTS xl_out",
      "CREATE TABLE xl_src (k INT, v STRING) USING parquet",
      "INSERT INTO xl_src VALUES (1, 'uno'), (2, 'dos')",
      "CREATE TABLE xl_out (k INT, v STRING) USING parquet")
    val res = ControlFlowExec.run(Dtsx.parse(xml),
      PipelineContext.overCatalog(spark))
    assert(res.statuses.values.forall(_ == ControlFlowExec.Succeeded), res.statuses)
    assert(spark.table("xl_out").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet == Set((1, "uno"), (2, "dos")))
  }

  test("synthetic package: ADO NET source and destination classes") {
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="adonet">
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="DFT" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.SSISADONETSrc" name="AS">
                    <properties>
                      <property name="TableOrViewName">[dbo].[ado_src]</property>
                    </properties>
                  </component>
                  <component componentClassID="Microsoft.SSISADONETDst" name="AD">
                    <properties>
                      <property name="TableOrViewName">[dbo].[ado_dst]</property>
                    </properties>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT\AS.Outputs[Out]" endId="P\DFT\AD.Inputs[In]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    sql(
      "DROP TABLE IF EXISTS ado_src", "DROP TABLE IF EXISTS ado_dst",
      "CREATE TABLE ado_src (k INT, v STRING) USING parquet",
      "INSERT INTO ado_src VALUES (7, 'x'), (8, 'y')",
      "CREATE TABLE ado_dst (k INT, v STRING) USING parquet")
    val res = ControlFlowExec.run(Dtsx.parse(xml),
      PipelineContext.overCatalog(spark))
    assert(res.statuses.values.forall(_ == ControlFlowExec.Succeeded), res.statuses)
    assert(spark.table("ado_dst").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet == Set((7, "x"), (8, "y")))
  }

  test("synthetic package: CharacterMap, CopyColumn, PercentageSampling") {
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="rowops">
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="DFT" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.OLEDBSource" name="S">
                    <properties>
                      <property name="SqlCommand">SELECT k, v FROM ro_src</property>
                      <property name="AccessMode">2</property>
                    </properties>
                    <outputs>
                      <output name="Out">
                        <outputColumns>
                          <outputColumn name="k"/>
                          <outputColumn name="v"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.CharacterMap" name="CM">
                    <inputs>
                      <input name="Character Map Input">
                        <inputColumns>
                          <inputColumn cachedName="v">
                            <properties>
                              <property name="MapFlags">2</property>
                            </properties>
                          </inputColumn>
                        </inputColumns>
                      </input>
                    </inputs>
                    <outputs>
                      <output name="Character Map Output">
                        <outputColumns>
                          <outputColumn name="v_lower">
                            <properties>
                              <property name="MapFlags">1</property>
                              <property name="InputColumnLineageId">#{{P\DFT\S.Outputs[Out].Columns[v]}}</property>
                            </properties>
                          </outputColumn>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.CopyMap" name="CP">
                    <outputs>
                      <output name="Copy Column Output">
                        <outputColumns>
                          <outputColumn name="k_copy">
                            <properties>
                              <property name="copyColumnId">#{{P\DFT\S.Outputs[Out].Columns[k]}}</property>
                            </properties>
                          </outputColumn>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.PercentageSampling" name="PS">
                    <properties>
                      <property name="SamplingValue">100</property>
                      <property name="SamplingSeed">42</property>
                    </properties>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="D">
                    <properties>
                      <property name="OpenRowset">ro_out</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT\S.Outputs[Out]" endId="P\DFT\CM.Inputs[In]"/>
                  <path startId="P\DFT\CM.Outputs[Out]" endId="P\DFT\CP.Inputs[In]"/>
                  <path startId="P\DFT\CP.Outputs[Out]" endId="P\DFT\PS.Inputs[In]"/>
                  <path startId="P\DFT\PS.Outputs[Out]" endId="P\DFT\D.Inputs[In]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    sql(
      "DROP TABLE IF EXISTS ro_src", "DROP TABLE IF EXISTS ro_out",
      "CREATE TABLE ro_src (k INT, v STRING) USING parquet",
      "INSERT INTO ro_src VALUES (1, 'MiXeD'), (2, 'other')",
      "CREATE TABLE ro_out (k INT, v STRING, v_lower STRING, k_copy INT) USING parquet")
    val res = ControlFlowExec.run(Dtsx.parse(xml),
      PipelineContext.overCatalog(spark))
    assert(res.statuses.values.forall(_ == ControlFlowExec.Succeeded), res.statuses)
    // MapFlags=2 uppercases v in place; MapFlags=1 adds lowercase copy;
    // CopyColumn duplicates k; 100% sampling keeps both rows
    val out = spark.table("ro_out").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    assert(out == Set((1, "MIXED", "mixed", 1), (2, "OTHER", "other", 2)))
  }

  test("synthetic package: Aggregate component (group by + sum + count)") {
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="aggp">
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="DFT" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.OLEDBSource" name="S">
                    <properties>
                      <property name="SqlCommand">SELECT g, x FROM agg_src</property>
                      <property name="AccessMode">2</property>
                    </properties>
                    <outputs>
                      <output name="Out">
                        <outputColumns>
                          <outputColumn name="g"/>
                          <outputColumn name="x"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.Aggregate" name="AGG">
                    <outputs>
                      <output name="Aggregate Output 1">
                        <outputColumns>
                          <outputColumn name="g">
                            <properties>
                              <property name="AggregationType">0</property>
                              <property name="AggregationColumnId">#{{P\DFT\S.Outputs[Out].Columns[g]}}</property>
                            </properties>
                          </outputColumn>
                          <outputColumn name="x_sum">
                            <properties>
                              <property name="AggregationType">4</property>
                              <property name="AggregationColumnId">#{{P\DFT\S.Outputs[Out].Columns[x]}}</property>
                            </properties>
                          </outputColumn>
                          <outputColumn name="n">
                            <properties>
                              <property name="AggregationType">2</property>
                            </properties>
                          </outputColumn>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="D">
                    <properties>
                      <property name="OpenRowset">agg_out</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT\S.Outputs[Out]" endId="P\DFT\AGG.Inputs[In]"/>
                  <path startId="P\DFT\AGG.Outputs[Aggregate Output 1]" endId="P\DFT\D.Inputs[In]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    sql(
      "DROP TABLE IF EXISTS agg_src", "DROP TABLE IF EXISTS agg_out",
      "CREATE TABLE agg_src (g STRING, x INT) USING parquet",
      "INSERT INTO agg_src VALUES ('a', 1), ('a', 2), ('b', 5)",
      "CREATE TABLE agg_out (g STRING, x_sum BIGINT, n BIGINT) USING parquet")
    val res = ControlFlowExec.run(Dtsx.parse(xml),
      PipelineContext.overCatalog(spark))
    assert(res.statuses.values.forall(_ == ControlFlowExec.Succeeded), res.statuses)
    assert(spark.table("agg_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      Set(("a", 3L, 2L), ("b", 5L, 1L)))
  }

  test("synthetic containers: FORLOOP and FOREACHLOOP parse and execute") {
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="loops">
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="FL" DTS:ExecutableType="STOCK:FORLOOP"
              DTS:InitExpression="@[User::I] = 0" DTS:EvalExpression="@[User::I] &lt; 3"
              DTS:AssignExpression="@[User::I] = @[User::I] + 1">
            <DTS:Executables>
              <DTS:Executable DTS:ObjectName="S1" DTS:ExecutableType="Microsoft.ExecuteSQLTask">
                <DTS:ObjectData>
                  <SQLTask:SqlTaskData SQLTask:SqlStatementSource="INSERT INTO loop_sink VALUES (1)"
                    xmlns:SQLTask="www.microsoft.com/sqlserver/dts/tasks/sqltask"/>
                </DTS:ObjectData>
              </DTS:Executable>
            </DTS:Executables>
          </DTS:Executable>
          <DTS:Executable DTS:ObjectName="FE" DTS:ExecutableType="STOCK:FOREACHLOOP">
            <DTS:ForEachEnumerator>
              <DTS:ObjectData>
                <FEIEItems>
                  <FEIEItem><FEIEItemValue DTS:Value="10"/></FEIEItem>
                  <FEIEItem><FEIEItemValue DTS:Value="20"/></FEIEItem>
                </FEIEItems>
              </DTS:ObjectData>
            </DTS:ForEachEnumerator>
            <DTS:ForEachVariableMappings>
              <DTS:ForEachVariableMapping DTS:VariableName="User::Item"/>
            </DTS:ForEachVariableMappings>
            <DTS:Executables>
              <DTS:Executable DTS:ObjectName="S2" DTS:ExecutableType="Microsoft.ExecuteSQLTask">
                <DTS:ObjectData>
                  <SQLTask:SqlTaskData SQLTask:SqlStatementSource="SELECT 5"
                    xmlns:SQLTask="www.microsoft.com/sqlserver/dts/tasks/sqltask">
                    <SQLTask:ResultBinding SQLTask:ResultName="x" SQLTask:DtsVariableName="User::Last"/>
                  </SQLTask:SqlTaskData>
                </DTS:ObjectData>
              </DTS:Executable>
            </DTS:Executables>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    sql("DROP TABLE IF EXISTS loop_sink",
      "CREATE TABLE loop_sink (v INT) USING parquet")
    val res = ControlFlowExec.run(Dtsx.parse(xml),
      PipelineContext.overCatalog(spark))
    assert(res.statuses.values.forall(_ == ControlFlowExec.Succeeded), res.statuses)
    assert(spark.table("loop_sink").count() == 3)   // ForLoop ran 3 times
    assert(res.variables("User::I") == 3)
    assert(res.variables("User::Item") == "20")     // last ForEach item
    assert(res.variables("User::Last") == 5)
  }

  test("Sample_Medium_Package: lookups -> sort -> checksum -> full merge join -> 5-way split") {
    sql(
      "DROP TABLE IF EXISTS SRC_InputTable",
      "DROP TABLE IF EXISTS DST_GenericTable",
      "DROP TABLE IF EXISTS LKP_LocalCategoryTable",
      "DROP TABLE IF EXISTS LKP_CategoryTable",
      "DROP TABLE IF EXISTS LKP_CountryTable",
      "DROP TABLE IF EXISTS sp_GenericUpdate_calls",
      "DROP TABLE IF EXISTS sp_GenericHardDelete_calls",
      // feed: (CategoryCode INT, CountryCode, Status→CategoryDescription)
      "CREATE TABLE SRC_InputTable (CategoryCode INT, CountryCode STRING, Status STRING) USING parquet",
      """INSERT INTO SRC_InputTable VALUES
        |(100, 'US', 'alpha'), (200, 'DE', 'beta'), (100, 'DE', 'alpha')""".stripMargin,
      "CREATE TABLE LKP_LocalCategoryTable (LocalCategoryID INT, CategoryDescription STRING) USING parquet",
      "INSERT INTO LKP_LocalCategoryTable VALUES (5, 'alpha'), (6, 'beta')",
      "CREATE TABLE LKP_CategoryTable (CategoryID INT, CategoryCode INT) USING parquet",
      "INSERT INTO LKP_CategoryTable VALUES (10, 100), (20, 200)",
      "CREATE TABLE LKP_CountryTable (CountryID INT, CountryCode STRING) USING parquet",
      "INSERT INTO LKP_CountryTable VALUES (1, 'US'), (2, 'DE')",
      "CREATE TABLE DST_GenericTable (CountryID INT, CategoryID INT, ETLCheckSum INT, DeletedFlag INT) USING parquet",
      // e1 matches feed r1 with equal checksum 1+10+5=16; e2 matches r2
      // with stale checksum; e3 is the default row; e4 is existing-only
      """INSERT INTO DST_GenericTable VALUES
        |(1, 10, 16, 0), (2, 20, 99, 0), (-1, 0, 0, 0), (1, 20, 55, 1)""".stripMargin)

    val spec = Dtsx.parseFile(s"$fixtures/Sample_Medium_Package.dtsx")
    val res = ControlFlowExec.run(spec, PipelineContext.overCatalog(spark))

    // gate expression @[User::SourceRowCount] > 0 held, DFT ran
    assert(res.variables("User::SourceRowCount") == 3L)
    assert(res.succeeded("DFT Load"), res.statuses)
    // the trailing EXEC stored-proc task has no Spark translation —
    // surfaced as an error, not silently skipped or mistranslated
    assert(res.statuses("SQL Set TaskWorkHistoryID")
      .isInstanceOf[ControlFlowExec.Errored])

    // row-count variables along every branch (package semantics:
    // post-sentinel ISNULL flags make INSERT/DELETE unreachable and
    // route all mismatches to UPDATE — faithfully reproduced)
    val v = res.variables
    assert(v("User::VAR_SelectRowCount") == 3L)
    assert(v("User::VAR_SelectRowCountExisting") == 4L)
    assert(v("User::VAR_TotalRowCount") == 5L)
    assert(v("User::VAR_InsertRowCount") == 0L)
    assert(v("User::VAR_UpdateRowCount") == 3L)
    assert(v("User::VAR_DeleteRowCount") == 0L)
    assert(v("User::VAR_DefaultRowCount") == 1L)
    assert(v("User::VAR_TrashArrivedUnchanged") == 1L)
    assert(v("User::VAR_TrashDefaultRow") == 1L)

    // staged set-based rewrites of the per-row OLE DB commands
    assert(spark.table("sp_GenericUpdate_calls").count() == 3)
    assert(spark.table("sp_GenericHardDelete_calls").count() == 0)
    // INSERT branch was empty — destination unchanged
    assert(spark.table("DST_GenericTable").count() == 4)
  }

  test("dtsx Merge: negative cachedSortKeyPosition = descending key, kept with direction") {
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="mdesc">
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="DFT" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.OLEDBSource" name="SRC1">
                    <properties>
                      <property name="SqlCommand">SELECT k, v FROM mdesc_src WHERE k &lt;= 2</property>
                      <property name="AccessMode">2</property>
                    </properties>
                    <outputs>
                      <output name="Out">
                        <outputColumns>
                          <outputColumn name="k"/>
                          <outputColumn name="v"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.OLEDBSource" name="SRC2">
                    <properties>
                      <property name="SqlCommand">SELECT k, v FROM mdesc_src WHERE k &gt;= 3</property>
                      <property name="AccessMode">2</property>
                    </properties>
                    <outputs>
                      <output name="Out">
                        <outputColumns>
                          <outputColumn name="k"/>
                          <outputColumn name="v"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.Merge" name="MRG">
                    <inputs>
                      <input name="Merge Input 1">
                        <inputColumns>
                          <inputColumn cachedName="k" cachedSortKeyPosition="-1"/>
                          <inputColumn cachedName="v" cachedSortKeyPosition="2"/>
                        </inputColumns>
                      </input>
                      <input name="Merge Input 2">
                        <inputColumns>
                          <inputColumn cachedName="k" cachedSortKeyPosition="-1"/>
                          <inputColumn cachedName="v" cachedSortKeyPosition="2"/>
                        </inputColumns>
                      </input>
                    </inputs>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT\SRC1.Outputs[Out]" endId="P\DFT\MRG.Inputs[Merge Input 1]"/>
                  <path startId="P\DFT\SRC2.Outputs[Out]" endId="P\DFT\MRG.Inputs[Merge Input 2]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    val spec = Dtsx.parse(xml)
    val flow = spec.tasks.collect { case graft.ir.CfTask.DataFlowTask(_, f) => f }.head
    val ms = flow.components.collectFirst { case m: graft.ir.Component.MergeSorted => m }.get
    assert(ms.sortKeys == Seq("k" -> false, "v" -> true))
    sql(
      "DROP TABLE IF EXISTS mdesc_src",
      "CREATE TABLE mdesc_src (k INT, v STRING) USING parquet",
      "INSERT INTO mdesc_src VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')")
    val out = graft.dag.DataFlowExec.run(flow,
      PipelineContext.overCatalog(spark))("MRG.out")
    assert(out.select("k").collect().map(_.getInt(0)).toSeq == Seq(4, 3, 2, 1))
  }

  test("dtsx MergeJoin: negative sort-key positions still pair the join keys") {
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="mjdesc">
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="DFT" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.MergeJoin" name="MJ">
                    <properties>
                      <property name="JoinType">2</property>
                      <property name="NumKeyColumns">1</property>
                    </properties>
                    <inputs>
                      <input name="Merge Join Left Input">
                        <inputColumns>
                          <inputColumn cachedName="lk" cachedSortKeyPosition="-1"/>
                        </inputColumns>
                      </input>
                      <input name="Merge Join Right Input">
                        <inputColumns>
                          <inputColumn cachedName="rk" cachedSortKeyPosition="-1"/>
                        </inputColumns>
                      </input>
                    </inputs>
                    <outputs>
                      <output name="Merge Join Output">
                        <outputColumns>
                          <outputColumn name="lk">
                            <properties>
                              <property name="InputColumnID">#{{P\DFT\MJ.Inputs[Merge Join Left Input].Columns[lk]}}</property>
                            </properties>
                          </outputColumn>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                </components>
                <paths/>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    val flow = Dtsx.parse(xml).tasks
      .collect { case graft.ir.CfTask.DataFlowTask(_, f) => f }.head
    val mj = flow.components.collectFirst { case m: graft.ir.Component.MergeJoin => m }.get
    assert(mj.keys == Seq("lk" -> "rk"))
  }

  test("dtsx Aggregate: multiple aggregation outputs run independent group-bys") {
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="magg">
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="DFT" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.OLEDBSource" name="S">
                    <properties>
                      <property name="SqlCommand">SELECT g, v FROM magg_src</property>
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
                            <properties>
                              <property name="AggregationType">0</property>
                            </properties>
                          </outputColumn>
                          <outputColumn name="sv">
                            <properties>
                              <property name="AggregationType">4</property>
                              <property name="AggregationColumnId">#{{P\DFT\AGG.Inputs[In].Columns[v]}}</property>
                            </properties>
                          </outputColumn>
                        </outputColumns>
                      </output>
                      <output name="Total">
                        <outputColumns>
                          <outputColumn name="n">
                            <properties>
                              <property name="AggregationType">2</property>
                            </properties>
                          </outputColumn>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="D_G">
                    <properties>
                      <property name="OpenRowset">magg_g</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="D_T">
                    <properties>
                      <property name="OpenRowset">magg_t</property>
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
    sql(
      "DROP TABLE IF EXISTS magg_src", "DROP TABLE IF EXISTS magg_g",
      "DROP TABLE IF EXISTS magg_t",
      "CREATE TABLE magg_src (g STRING, v INT) USING parquet",
      "INSERT INTO magg_src VALUES ('a', 1), ('a', 2), ('b', 10)",
      "CREATE TABLE magg_g (g STRING, sv BIGINT) USING parquet",
      "CREATE TABLE magg_t (n BIGINT) USING parquet")
    val res = ControlFlowExec.run(Dtsx.parse(xml),
      PipelineContext.overCatalog(spark))
    assert(res.statuses.values.forall(_ == ControlFlowExec.Succeeded), res.statuses)
    val byG = spark.table("magg_g").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(byG == Set(("a", 3L), ("b", 10L)))
    assert(spark.table("magg_t").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("dtsx Azure feature-pack + Recordset components execute as file readers/writers") {
    val root = java.nio.file.Files.createTempDirectory("graft_azure").toString
    val in = new java.io.File(root, "in"); in.mkdirs()
    java.nio.file.Files.write(new java.io.File(in, "part.csv").toPath,
      "k,v\n1,a\n2,b\n3,c\n".getBytes("UTF-8"))
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="azure">
        <DTS:ConnectionManagers>
          <DTS:ConnectionManager DTS:ObjectName="ADLS" DTS:CreationName="ADLS">
            <DTS:ObjectData>
              <DTS:ConnectionManager DTS:ConnectionString={root}/>
            </DTS:ObjectData>
          </DTS:ConnectionManager>
          <DTS:ConnectionManager DTS:ObjectName="BLOB" DTS:CreationName="AzureStorage">
            <DTS:ObjectData>
              <DTS:ConnectionManager DTS:ConnectionString={root}/>
            </DTS:ObjectData>
          </DTS:ConnectionManager>
        </DTS:ConnectionManagers>
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="DFT1" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.SSISAzureDataLakeStoreSrc" name="ASRC">
                    <connections><connection connectionManagerID="Package.ConnectionManagers[ADLS]"/></connections>
                    <properties>
                      <property name="FilePath">in</property>
                      <property name="FileFormat">Text</property>
                      <property name="ColumnNamesInFirstDataRow">True</property>
                      <property name="ColumnDelimiter">_x002C_</property>
                    </properties>
                    <outputs>
                      <output name="Out">
                        <outputColumns>
                          <outputColumn name="k" dataType="i4"/>
                          <outputColumn name="v" dataType="wstr" length="10"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.RecordsetDestination" name="RS">
                    <properties><property name="VariableName">User::Rows</property></properties>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT1\ASRC.Outputs[Out]" endId="P\DFT1\RS.Inputs[In]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
          <DTS:Executable DTS:ObjectName="DFT2" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.SSISAzureBlobSrc" name="BSRC">
                    <connections><connection connectionManagerID="Package.ConnectionManagers[BLOB]"/></connections>
                    <properties>
                      <property name="BlobContainer">in</property>
                      <property name="BlobFileFormat">Text</property>
                      <property name="ColumnNamesInFirstDataRow">True</property>
                      <property name="ColumnDelimiter">_x002C_</property>
                    </properties>
                    <outputs>
                      <output name="Out">
                        <outputColumns>
                          <outputColumn name="k" dataType="i4"/>
                          <outputColumn name="v" dataType="wstr" length="10"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.SSISAzureDataLakeStoreDst" name="ADST">
                    <connections><connection connectionManagerID="Package.ConnectionManagers[ADLS]"/></connections>
                    <properties>
                      <property name="FilePath">outp</property>
                      <property name="FileFormat">Parquet</property>
                    </properties>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT2\BSRC.Outputs[Out]" endId="P\DFT2\ADST.Inputs[In]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    val res = ControlFlowExec.run(Dtsx.parse(xml),
      PipelineContext.overCatalog(spark))
    assert(res.statuses.values.forall(_ == ControlFlowExec.Succeeded), res.statuses)
    // Recordset: the variable holds the driver-side row list
    val rows = res.variables("User::Rows").asInstanceOf[Seq[org.apache.spark.sql.Row]]
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "a"), (2, "b"), (3, "c")))
    // Blob source -> ADLS parquet destination round-trip
    val back = spark.read.parquet(s"$root/outp")
    assert(back.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "a"), (2, "b"), (3, "c")))
  }

  test("dtsx Disabled tasks are skipped, like the reference's parser") {
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="dis">
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="on" DTS:ExecutableType="Microsoft.ExecuteSQLTask">
            <DTS:ObjectData>
              <SQLTask:SqlTaskData SQLTask:SqlStatementSource="SELECT 1"
                xmlns:SQLTask="www.microsoft.com/sqlserver/dts/tasks/sqltask"/>
            </DTS:ObjectData>
          </DTS:Executable>
          <DTS:Executable DTS:ObjectName="off" DTS:Disabled="True"
              DTS:ExecutableType="Microsoft.ExecuteSQLTask">
            <DTS:ObjectData>
              <SQLTask:SqlTaskData SQLTask:SqlStatementSource="SELECT broken FROM nowhere"
                xmlns:SQLTask="www.microsoft.com/sqlserver/dts/tasks/sqltask"/>
            </DTS:ObjectData>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    val spec = Dtsx.parse(xml)
    assert(spec.tasks.map(_.name) == Seq("on"))
  }

  test("dtsx Foreach ADO enumerator parses to a recordset-driven loop") {
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="adoloop">
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="FEL" DTS:ExecutableType="STOCK:FOREACHLOOP">
            <DTS:ForEachEnumerator DTS:CreationName="Microsoft.ForEachADOEnumerator">
              <DTS:ObjectData>
                <FEEADO DTS:ObjectVariableName="User::RS"/>
              </DTS:ObjectData>
            </DTS:ForEachEnumerator>
            <DTS:ForEachVariableMappings>
              <DTS:ForEachVariableMapping DTS:VariableName="User::Item"/>
            </DTS:ForEachVariableMappings>
            <DTS:Executables/>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    val spec = Dtsx.parse(xml)
    spec.tasks.head match {
      case CfTask.ForEachAdo(_, variable, src, 0, _) =>
        assert(variable == "User::Item" && src == "User::RS")
      case other => fail(s"expected ForEachAdo, got $other")
    }
  }

  test("dtsx Azure sources reject unsupported formats loudly") {
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="azbad">
        <DTS:ConnectionManagers>
          <DTS:ConnectionManager DTS:ObjectName="BLOB" DTS:CreationName="AzureStorage">
            <DTS:ObjectData><DTS:ConnectionManager DTS:ConnectionString="/tmp"/></DTS:ObjectData>
          </DTS:ConnectionManager>
        </DTS:ConnectionManagers>
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="DFT" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.SSISAzureBlobSrc" name="B">
                    <connections><connection connectionManagerID="Package.ConnectionManagers[BLOB]"/></connections>
                    <properties>
                      <property name="BlobContainer">c</property>
                      <property name="BlobFileFormat">Avro</property>
                    </properties>
                  </component>
                </components>
                <paths/>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    val e = intercept[RuntimeException](Dtsx.parse(xml))
    assert(e.getMessage.contains("BlobFileFormat"))
  }

  test("dtsx Pivot -> UnPivot -> Audit chain and RowSampling ports execute end-to-end") {
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="pva">
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="DFT" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.OLEDBSource" name="SRC">
                    <properties>
                      <property name="SqlCommand">SELECT k, cat, v FROM pivot_src</property>
                      <property name="AccessMode">2</property>
                    </properties>
                    <outputs>
                      <output name="Out">
                        <outputColumns>
                          <outputColumn name="k"/>
                          <outputColumn name="cat"/>
                          <outputColumn name="v"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.Pivot" name="PVT">
                    <inputs>
                      <input name="Pivot Default Input">
                        <inputColumns>
                          <inputColumn cachedName="k">
                            <properties><property name="PivotUsage">1</property></properties>
                          </inputColumn>
                          <inputColumn cachedName="cat">
                            <properties><property name="PivotUsage">2</property></properties>
                          </inputColumn>
                          <inputColumn cachedName="v">
                            <properties><property name="PivotUsage">3</property></properties>
                          </inputColumn>
                        </inputColumns>
                      </input>
                    </inputs>
                    <outputs>
                      <output name="Pivot Default Output">
                        <outputColumns>
                          <outputColumn name="val_a">
                            <properties><property name="PivotKeyValue">a</property></properties>
                          </outputColumn>
                          <outputColumn name="val_b">
                            <properties><property name="PivotKeyValue">b</property></properties>
                          </outputColumn>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.UnPivot" name="UNP">
                    <inputs>
                      <input name="UnPivot Input">
                        <inputColumns>
                          <inputColumn cachedName="k"/>
                          <inputColumn cachedName="val_a">
                            <properties>
                              <property name="PivotKeyValue">a</property>
                              <property name="DestinationColumn">P\DFT\UNP.Outputs[UnPivot Output].Columns[v]</property>
                            </properties>
                          </inputColumn>
                          <inputColumn cachedName="val_b">
                            <properties>
                              <property name="PivotKeyValue">b</property>
                              <property name="DestinationColumn">P\DFT\UNP.Outputs[UnPivot Output].Columns[v]</property>
                            </properties>
                          </inputColumn>
                        </inputColumns>
                      </input>
                    </inputs>
                    <outputs>
                      <output name="UnPivot Output">
                        <outputColumns>
                          <outputColumn refId="P\DFT\UNP.Outputs[UnPivot Output].Columns[v]" name="v"/>
                          <outputColumn refId="P\DFT\UNP.Outputs[UnPivot Output].Columns[cat]" name="cat"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.Audit" name="AUD">
                    <outputs>
                      <output name="Audit Output">
                        <outputColumns>
                          <outputColumn name="pkg">
                            <properties><property name="AuditType">2</property></properties>
                          </outputColumn>
                          <outputColumn name="task">
                            <properties><property name="AuditType">7</property></properties>
                          </outputColumn>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="DST">
                    <properties>
                      <property name="OpenRowset">pva_t</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT\SRC.Outputs[Out]" endId="P\DFT\PVT.Inputs[Pivot Default Input]"/>
                  <path startId="P\DFT\PVT.Outputs[Pivot Default Output]" endId="P\DFT\UNP.Inputs[UnPivot Input]"/>
                  <path startId="P\DFT\UNP.Outputs[UnPivot Output]" endId="P\DFT\AUD.Inputs[Audit Input]"/>
                  <path startId="P\DFT\AUD.Outputs[Audit Output]" endId="P\DFT\DST.Inputs[In]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
          <DTS:Executable DTS:ObjectName="DFT_RS" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.OLEDBSource" name="SRC2">
                    <properties>
                      <property name="SqlCommand">SELECT k FROM rsamp_src</property>
                      <property name="AccessMode">2</property>
                    </properties>
                    <outputs>
                      <output name="Out">
                        <outputColumns><outputColumn name="k"/></outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.RowSampling" name="RS">
                    <properties>
                      <property name="SamplingValue">3</property>
                      <property name="SamplingSeed">42</property>
                    </properties>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="DST_S">
                    <properties>
                      <property name="OpenRowset">rsamp_sel</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="DST_U">
                    <properties>
                      <property name="OpenRowset">rsamp_uns</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT_RS\SRC2.Outputs[Out]" endId="P\DFT_RS\RS.Inputs[In]"/>
                  <path startId="P\DFT_RS\RS.Outputs[Sampling Selected Output]" endId="P\DFT_RS\DST_S.Inputs[In]"/>
                  <path startId="P\DFT_RS\RS.Outputs[Sampling Unselected Output]" endId="P\DFT_RS\DST_U.Inputs[In]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    sql(
      "DROP TABLE IF EXISTS pivot_src", "DROP TABLE IF EXISTS pva_t",
      "DROP TABLE IF EXISTS rsamp_src", "DROP TABLE IF EXISTS rsamp_sel",
      "DROP TABLE IF EXISTS rsamp_uns",
      "CREATE TABLE pivot_src (k INT, cat STRING, v INT) USING parquet",
      "INSERT INTO pivot_src VALUES (1,'a',10), (1,'b',11), (2,'a',20), (2,'b',21)",
      "CREATE TABLE pva_t (k INT, cat STRING, v INT, pkg STRING, task STRING) USING parquet",
      "CREATE TABLE rsamp_src (k INT) USING parquet",
      "INSERT INTO rsamp_src VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9)",
      "CREATE TABLE rsamp_sel (k INT) USING parquet",
      "CREATE TABLE rsamp_uns (k INT) USING parquet")
    val res = ControlFlowExec.run(Dtsx.parse(xml),
      PipelineContext.overCatalog(spark))
    assert(res.statuses.values.forall(_ == ControlFlowExec.Succeeded), res.statuses)
    // pivot→unpivot round-trips the rows; audit columns carry the
    // seeded System:: variables (package name, executing task name)
    val back = spark.table("pva_t").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2),
        r.getString(3), r.getString(4))).toSet
    assert(back == Set((1, "a", 10, "pva", "DFT"), (1, "b", 11, "pva", "DFT"),
      (2, "a", 20, "pva", "DFT"), (2, "b", 21, "pva", "DFT")))
    // row sampling: exactly N selected, the complement unselected
    val sel = spark.table("rsamp_sel").collect().map(_.getInt(0)).toSet
    val uns = spark.table("rsamp_uns").collect().map(_.getInt(0)).toSet
    assert(sel.size == 3 && uns.size == 7)
    assert((sel ++ uns) == (0 to 9).toSet && (sel & uns).isEmpty)
  }

  test("dtsx TermExtraction, TermLookup, FuzzyLookup, FuzzyGrouping, Cache classes") {
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="txt">
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="DFT_TE" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.OLEDBSource" name="S1">
                    <properties>
                      <property name="SqlCommand">SELECT id, txt FROM te_docs</property>
                      <property name="AccessMode">2</property>
                    </properties>
                    <outputs>
                      <output name="Out">
                        <outputColumns>
                          <outputColumn name="id"/>
                          <outputColumn name="txt"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.TermExtraction" name="TE">
                    <properties>
                      <property name="FrequencyThreshold">2</property>
                    </properties>
                    <inputs>
                      <input name="Term Extraction Input">
                        <inputColumns>
                          <inputColumn cachedName="txt"/>
                        </inputColumns>
                      </input>
                    </inputs>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="D1">
                    <properties>
                      <property name="OpenRowset">te_out</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                  <component componentClassID="Microsoft.Cache" name="CCH">
                    <connections>
                      <connection connectionManagerID="Package.ConnectionManagers[TermCache]"/>
                    </connections>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT_TE\S1.Outputs[Out]" endId="P\DFT_TE\TE.Inputs[Term Extraction Input]"/>
                  <path startId="P\DFT_TE\TE.Outputs[Out]" endId="P\DFT_TE\CCH.Inputs[In]"/>
                  <path startId="P\DFT_TE\CCH.Outputs[Out]" endId="P\DFT_TE\D1.Inputs[In]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
          <DTS:Executable DTS:ObjectName="DFT_TL" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.OLEDBSource" name="S2">
                    <properties>
                      <property name="SqlCommand">SELECT id, txt FROM te_docs</property>
                      <property name="AccessMode">2</property>
                    </properties>
                    <outputs>
                      <output name="Out">
                        <outputColumns>
                          <outputColumn name="id"/>
                          <outputColumn name="txt"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.TermLookup" name="TL">
                    <properties>
                      <property name="RefTermTable">[dbo].[term_ref]</property>
                      <property name="RefTermColumn">Term</property>
                    </properties>
                    <inputs>
                      <input name="Term Lookup Input">
                        <inputColumns>
                          <inputColumn cachedName="id">
                            <properties><property name="InputColumnType">0</property></properties>
                          </inputColumn>
                          <inputColumn cachedName="txt">
                            <properties><property name="InputColumnType">1</property></properties>
                          </inputColumn>
                        </inputColumns>
                      </input>
                    </inputs>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="D2">
                    <properties>
                      <property name="OpenRowset">tl_out</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT_TL\S2.Outputs[Out]" endId="P\DFT_TL\TL.Inputs[Term Lookup Input]"/>
                  <path startId="P\DFT_TL\TL.Outputs[Out]" endId="P\DFT_TL\D2.Inputs[In]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
          <DTS:Executable DTS:ObjectName="DFT_FZ" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.OLEDBSource" name="S3">
                    <properties>
                      <property name="SqlCommand">SELECT rid, cname FROM fz_stream</property>
                      <property name="AccessMode">2</property>
                    </properties>
                    <outputs>
                      <output name="Out">
                        <outputColumns>
                          <outputColumn name="rid"/>
                          <outputColumn name="cname"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.FuzzyLookup" name="FL">
                    <properties>
                      <property name="ReferenceTableName">[dbo].[fz_ref]</property>
                      <property name="MinSimilarity">0.8</property>
                      <property name="MaxOutputMatchesPerInput">1</property>
                    </properties>
                    <inputs>
                      <input name="Fuzzy Lookup Input">
                        <inputColumns>
                          <inputColumn cachedName="cname">
                            <properties><property name="JoinToReferenceColumn">refname</property></properties>
                          </inputColumn>
                        </inputColumns>
                      </input>
                    </inputs>
                    <outputs>
                      <output name="Fuzzy Lookup Output">
                        <outputColumns>
                          <outputColumn name="ref_city">
                            <properties><property name="CopyFromReferenceColumn">city</property></properties>
                          </outputColumn>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.FuzzyGrouping" name="FG">
                    <properties>
                      <property name="MinSimilarity">0.8</property>
                    </properties>
                    <inputs>
                      <input name="Fuzzy Grouping Input">
                        <inputColumns>
                          <inputColumn cachedName="rid"/>
                          <inputColumn cachedName="cname">
                            <properties><property name="ToBeCleaned">true</property></properties>
                          </inputColumn>
                        </inputColumns>
                      </input>
                    </inputs>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="D3">
                    <properties>
                      <property name="OpenRowset">fz_out</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT_FZ\S3.Outputs[Out]" endId="P\DFT_FZ\FL.Inputs[Fuzzy Lookup Input]"/>
                  <path startId="P\DFT_FZ\FL.Outputs[Fuzzy Lookup Output]" endId="P\DFT_FZ\FG.Inputs[Fuzzy Grouping Input]"/>
                  <path startId="P\DFT_FZ\FG.Outputs[Out]" endId="P\DFT_FZ\D3.Inputs[In]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    sql(
      "DROP TABLE IF EXISTS te_docs", "DROP TABLE IF EXISTS te_out",
      "DROP TABLE IF EXISTS term_ref", "DROP TABLE IF EXISTS tl_out",
      "DROP TABLE IF EXISTS fz_stream", "DROP TABLE IF EXISTS fz_ref",
      "DROP TABLE IF EXISTS fz_out",
      "CREATE TABLE te_docs (id INT, txt STRING) USING parquet",
      "INSERT INTO te_docs VALUES (1, 'spark spark flink'), (2, 'spark beam')",
      "CREATE TABLE te_out (term STRING, term_count BIGINT) USING parquet",
      "CREATE TABLE term_ref (Term STRING) USING parquet",
      "INSERT INTO term_ref VALUES ('spark'), ('beam')",
      "CREATE TABLE tl_out (id INT, term STRING, term_freq BIGINT) USING parquet",
      "CREATE TABLE fz_stream (rid INT, cname STRING) USING parquet",
      "INSERT INTO fz_stream VALUES (1, 'acme corp'), (2, 'acme c0rp'), (3, 'zzz inc')",
      "CREATE TABLE fz_ref (refname STRING, city STRING) USING parquet",
      "INSERT INTO fz_ref VALUES ('acme corp', 'berlin'), ('zzz inc', 'oslo')",
      "CREATE TABLE fz_out (rid INT, cname STRING, ref_city STRING, _Similarity DOUBLE, _key_out INT) USING parquet")
    val res = ControlFlowExec.run(Dtsx.parse(xml),
      PipelineContext.overCatalog(spark))
    assert(res.statuses.values.forall(_ == ControlFlowExec.Succeeded), res.statuses)
    // term extraction at threshold 2: only 'spark' (count 3) survives
    val te = spark.table("te_out").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(te == Set(("spark", 3L)))
    // term lookup: per-doc frequencies of the reference terms
    val tl = spark.table("tl_out").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(tl == Set((1, "spark", 2L), (2, "spark", 1L), (2, "beam", 1L)))
    // fuzzy lookup enriched the near-match; fuzzy grouping keyed the
    // 'acme' near-dups to the smallest rid
    val fz = spark.table("fz_out").collect()
      .map(r => (r.getInt(0), r.getString(2), r.getInt(4))).toSet
    assert(fz == Set((1, "berlin", 1), (2, "berlin", 1), (3, "oslo", 3)))
  }

  test("dtsx SCD component routes new/changed/historical/fixed/unchanged outputs") {
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="scd">
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="DFT" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.OLEDBSource" name="S">
                    <properties>
                      <property name="SqlCommand">SELECT bk, t1attr, t2attr, fixattr FROM scd_feed</property>
                      <property name="AccessMode">2</property>
                    </properties>
                    <outputs>
                      <output name="Out">
                        <outputColumns>
                          <outputColumn name="bk"/>
                          <outputColumn name="t1attr"/>
                          <outputColumn name="t2attr"/>
                          <outputColumn name="fixattr"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.SCD" name="SCD">
                    <properties>
                      <property name="OpenRowset">scd_dim</property>
                    </properties>
                    <inputs>
                      <input name="Slowly Changing Dimension Input">
                        <inputColumns>
                          <inputColumn cachedName="bk">
                            <properties><property name="ColumnType">1</property></properties>
                          </inputColumn>
                          <inputColumn cachedName="t1attr">
                            <properties><property name="ColumnType">2</property></properties>
                          </inputColumn>
                          <inputColumn cachedName="fixattr">
                            <properties><property name="ColumnType">3</property></properties>
                          </inputColumn>
                          <inputColumn cachedName="t2attr">
                            <properties><property name="ColumnType">4</property></properties>
                          </inputColumn>
                        </inputColumns>
                      </input>
                    </inputs>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="D_NEW">
                    <properties>
                      <property name="OpenRowset">scd_new</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="D_CHG">
                    <properties>
                      <property name="OpenRowset">scd_chg</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="D_HIS">
                    <properties>
                      <property name="OpenRowset">scd_his</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="D_FIX">
                    <properties>
                      <property name="OpenRowset">scd_fix</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT\S.Outputs[Out]" endId="P\DFT\SCD.Inputs[Slowly Changing Dimension Input]"/>
                  <path startId="P\DFT\SCD.Outputs[New Output]" endId="P\DFT\D_NEW.Inputs[In]"/>
                  <path startId="P\DFT\SCD.Outputs[Changing Attribute Updates Output]" endId="P\DFT\D_CHG.Inputs[In]"/>
                  <path startId="P\DFT\SCD.Outputs[Historical Attribute Inserts Output]" endId="P\DFT\D_HIS.Inputs[In]"/>
                  <path startId="P\DFT\SCD.Outputs[Fixed Attribute Output]" endId="P\DFT\D_FIX.Inputs[In]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    sql(
      "DROP TABLE IF EXISTS scd_dim", "DROP TABLE IF EXISTS scd_feed",
      "DROP TABLE IF EXISTS scd_new", "DROP TABLE IF EXISTS scd_chg",
      "DROP TABLE IF EXISTS scd_his", "DROP TABLE IF EXISTS scd_fix",
      "CREATE TABLE scd_dim (bk INT, t1attr STRING, t2attr STRING, fixattr STRING) USING parquet",
      "INSERT INTO scd_dim VALUES (1,'a','p','f'), (2,'b','q','f'), (3,'c','r','f'), (4,'d','s','f')",
      "CREATE TABLE scd_feed (bk INT, t1attr STRING, t2attr STRING, fixattr STRING) USING parquet",
      // 1: unchanged; 2: type-1 change; 3: type-2 change; 4: fixed-attr
      // violation; 9: new key
      """INSERT INTO scd_feed VALUES (1,'a','p','f'), (2,'B','q','f'),
        |(3,'c','R','f'), (4,'d','s','F'), (9,'z','z','f')""".stripMargin,
      "CREATE TABLE scd_new (bk INT, t1attr STRING, t2attr STRING, fixattr STRING) USING parquet",
      "CREATE TABLE scd_chg (bk INT, t1attr STRING, t2attr STRING, fixattr STRING) USING parquet",
      "CREATE TABLE scd_his (bk INT, t1attr STRING, t2attr STRING, fixattr STRING) USING parquet",
      "CREATE TABLE scd_fix (bk INT, t1attr STRING, t2attr STRING, fixattr STRING) USING parquet")
    val res = ControlFlowExec.run(Dtsx.parse(xml),
      PipelineContext.overCatalog(spark))
    assert(res.statuses.values.forall(_ == ControlFlowExec.Succeeded), res.statuses)
    def keys(t: String): Set[Int] =
      spark.table(t).select("bk").collect().map(_.getInt(0)).toSet
    assert(keys("scd_new") == Set(9))
    assert(keys("scd_chg") == Set(2))
    assert(keys("scd_his") == Set(3))
    assert(keys("scd_fix") == Set(4))
  }

  test("dtsx ExportColumn writes files that ImportColumn reads back") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dtsx_blob")
    dir.toFile.deleteOnExit()
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="blob">
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="DFT" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.OLEDBSource" name="S">
                    <properties>
                      <property name="SqlCommand">SELECT fname, payload FROM blob_src</property>
                      <property name="AccessMode">2</property>
                    </properties>
                    <outputs>
                      <output name="Out">
                        <outputColumns>
                          <outputColumn name="fname"/>
                          <outputColumn name="payload"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                  <component componentClassID="Microsoft.ExportColumn" name="EXP">
                    <inputs>
                      <input name="Export Column Input">
                        <inputColumns>
                          <inputColumn cachedName="fname">
                            <properties>
                              <property name="FileDataColumnID">P\DFT\EXP.Inputs[Export Column Input].Columns[payload]</property>
                            </properties>
                          </inputColumn>
                          <inputColumn cachedName="payload"/>
                        </inputColumns>
                      </input>
                    </inputs>
                  </component>
                  <component componentClassID="Microsoft.ImportColumn" name="IMP">
                    <properties>
                      <property name="BaseDirectory">{dir.toString}</property>
                    </properties>
                    <inputs>
                      <input name="Import Column Input">
                        <inputColumns>
                          <inputColumn cachedName="fname">
                            <properties>
                              <property name="FileDataColumnID">P\DFT\IMP.Outputs[Import Column Output].Columns[blob]</property>
                            </properties>
                          </inputColumn>
                        </inputColumns>
                      </input>
                    </inputs>
                  </component>
                  <component componentClassID="Microsoft.OLEDBDestination" name="D">
                    <properties>
                      <property name="OpenRowset">blob_t</property>
                      <property name="AccessMode">3</property>
                    </properties>
                  </component>
                </components>
                <paths>
                  <path startId="P\DFT\S.Outputs[Out]" endId="P\DFT\EXP.Inputs[Export Column Input]"/>
                  <path startId="P\DFT\EXP.Outputs[Out]" endId="P\DFT\IMP.Inputs[Import Column Input]"/>
                  <path startId="P\DFT\IMP.Outputs[Out]" endId="P\DFT\D.Inputs[In]"/>
                </paths>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    sql(
      "DROP TABLE IF EXISTS blob_src", "DROP TABLE IF EXISTS blob_t",
      "CREATE TABLE blob_src (fname STRING, payload STRING) USING parquet",
      s"INSERT INTO blob_src VALUES ('$dir/a.bin', 'alpha'), ('$dir/b.bin', 'beta')",
      "CREATE TABLE blob_t (fname STRING, payload STRING, blob BINARY) USING parquet")
    val res = ControlFlowExec.run(Dtsx.parse(xml),
      PipelineContext.overCatalog(spark))
    assert(res.statuses.values.forall(_ == ControlFlowExec.Succeeded), res.statuses)
    val back = spark.table("blob_t").collect()
      .map(r => (r.getString(0).split('/').last,
        new String(r.getAs[Array[Byte]](2), "UTF-8"))).toSet
    assert(back == Set(("a.bin", "alpha"), ("b.bin", "beta")))
  }

  test("dtsx flat-file ui8 column maps to DECIMAL(20,0) (full unsigned-64 range)") {
    val xml =
      <DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="ui8p">
        <DTS:ConnectionManagers>
          <DTS:ConnectionManager DTS:ObjectName="FF" DTS:CreationName="FLATFILE">
            <DTS:ObjectData>
              <DTS:ConnectionManager DTS:ConnectionString="/tmp/nowhere.csv"
                  DTS:Format="Delimited" DTS:ColumnNamesInFirstDataRow="True">
                <DTS:FlatFileColumns>
                  <DTS:FlatFileColumn DTS:ObjectName="big" DTS:ColumnDelimiter="_x002C_"/>
                </DTS:FlatFileColumns>
              </DTS:ConnectionManager>
            </DTS:ObjectData>
          </DTS:ConnectionManager>
        </DTS:ConnectionManagers>
        <DTS:Executables>
          <DTS:Executable DTS:ObjectName="DFT" DTS:ExecutableType="Microsoft.Pipeline">
            <DTS:ObjectData>
              <pipeline>
                <components>
                  <component componentClassID="Microsoft.FlatFileSource" name="FFS">
                    <connections>
                      <connection connectionManagerID="Package.ConnectionManagers[FF]"/>
                    </connections>
                    <outputs>
                      <output name="Out">
                        <outputColumns>
                          <outputColumn name="big" dataType="ui8"/>
                        </outputColumns>
                      </output>
                    </outputs>
                  </component>
                </components>
                <paths/>
              </pipeline>
            </DTS:ObjectData>
          </DTS:Executable>
        </DTS:Executables>
      </DTS:Executable>
    val flow = Dtsx.parse(xml).tasks
      .collect { case graft.ir.CfTask.DataFlowTask(_, f) => f }.head
    val src = flow.components.collectFirst { case s: graft.ir.Component.SourceCsv => s }.get
    assert(src.schemaDdl.exists(_.contains("DECIMAL(20,0)")))
  }

  test("OLE DB Command escape hatch: EXEC parses to PerRowCommand; live CALL to a Derby proc") {
    import graft.ir.Component
    import graft.sources.Jdbc
    // 1. wiring, from the reference's own fixture: the EXEC-shaped
    // (non-MERGE-rewritable) commands carry SQL + connection-manager
    // name + ordered params; staging table matches the old fallback
    val spec = Dtsx.parseFile(s"$fixtures/Sample_Medium_Package.dtsx")
    val flow = spec.tasks
      .collect { case CfTask.DataFlowTask(_, f) => f }.head
    val sp = flow.components.collectFirst {
      case c: Component.PerRowCommand if c.name == "CMD_SP" => c }.get
    assert(sp.connRef == "DBX_Output")
    assert(sp.sql.toUpperCase.startsWith("EXEC") && sp.sql.count(_ == '?') == 7)
    assert(sp.paramCols.size == 7)
    assert(sp.stagingTable == "sp_GenericUpdate_calls")
    assert(flow.components.collectFirst {
      case c: Component.PerRowCommand if c.name == "CMD_Delete" => c }
      .exists(_.paramCols.size == 3))

    // 2. the live path, stored-proc shape: a Java-backed Derby
    // procedure (the kind of arbitrary side effect no MERGE rewrite
    // can express) called once per row through the registered
    // connection, batched per partition
    val conn = Jdbc.derbyMemory("graft_dtsx_sp")
    import spark.implicits._
    Jdbc.write(Seq((1L, 10L, 0), (2L, 10L, 0), (3L, 10L, 0), (4L, 10L, 0))
      .toDF("id", "cents", "flagged"), conn, "flags",
      graft.ir.Component.WriteMode.Overwrite)
    val raw = java.sql.DriverManager.getConnection(conn.url)
    try raw.createStatement().execute(
      "CREATE PROCEDURE FLAG_ROW(IN P_ID BIGINT, IN P_BONUS BIGINT) " +
        "LANGUAGE JAVA PARAMETER STYLE JAVA MODIFIES SQL DATA " +
        "EXTERNAL NAME 'graft.frontend.DerbyProcs.flagRow'")
    finally raw.close()
    val ctx = PipelineContext.overCatalog(spark)
    ctx.connections("DerbyConn") = conn
    graft.dag.DataFlowExec.run(graft.ir.DataFlow("sp_live", Seq(
      Component.SourceQuery("src",
        "SELECT * FROM VALUES (1L, 5L), (3L, 7L) AS t(id, bonus)"),
      Component.PerRowCommand("cmd", "DerbyConn", "CALL FLAG_ROW(?, ?)",
        paramCols = Seq("id", "bonus"), stagingTable = "flag_calls")),
      Seq(graft.ir.Path("src", "cmd"))), ctx)
    assert(ctx.vars("cmd.rows_affected") == 2L)
    val back = Jdbc.read(spark, conn, "flags")
      .select("id", "cents", "flagged").as[(Long, Long, Int)]
      .collect().sortBy(_._1).toSeq
    assert(back == Seq((1L, 15L, 1), (2L, 10L, 0), (3L, 17L, 1),
      (4L, 10L, 0)))
  }
}

/** Derby Java-procedure target — must be a top-level object so the
  * compiler emits a STATIC forwarder (`EXTERNAL NAME` resolves static
  * methods only). Runs inside the server's nested connection: the
  * update joins the calling statement's transaction. */
object DerbyProcs {
  def flagRow(id: Long, bonus: Long): Unit = {
    val c = java.sql.DriverManager.getConnection("jdbc:default:connection")
    val st = c.prepareStatement(
      """UPDATE flags SET "flagged" = "flagged" + 1, """ +
        """"cents" = "cents" + ? WHERE "id" = ?""")
    st.setLong(1, bonus)
    st.setLong(2, id)
    st.executeUpdate()
    st.close()
  }
}
