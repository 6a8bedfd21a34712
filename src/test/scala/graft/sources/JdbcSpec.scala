package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ir.Component.WriteMode

/** Live JDBC round-trip against embedded Derby (the pure-Java driver
  * Spark ships — no new dependency): write modes, partitioned reads,
  * and type preservation through a real store. */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val conn = Jdbc.derbyMemory("graft_test")

  test("overwrite write + partitioned read round-trips rows and schema") {
    val df = spark.range(0, 100).select(col("id").as("k"),
      (col("id") % 7).as("v"), concat(lit("name_"), col("id")).as("name"))
    Jdbc.write(df, conn, "t_roundtrip", WriteMode.Overwrite)
    val back = Jdbc.read(spark, conn, "t_roundtrip",
      Some(Jdbc.JdbcPartitioning("k", 0, 99, 4)))
    // the partitioned read issues 4 parallel range queries
    assert(back.rdd.getNumPartitions == 4)
    assert(back.columns.toSeq == Seq("k", "v", "name"))
    val got = back.select("k", "v", "name")
      .as[(Long, Long, String)].collect().toSet
    val want = df.as[(Long, Long, String)].collect().toSet
    assert(got == want && want.size == 100)
  }

  test("overwrite replaces; append accumulates") {
    val df = spark.range(0, 20).select(col("id").as("k"))
    Jdbc.write(df, conn, "t_modes", WriteMode.Overwrite)
    Jdbc.write(df.filter(col("k") < 10), conn, "t_modes", WriteMode.Overwrite)
    assert(Jdbc.read(spark, conn, "t_modes").count() == 10)
    Jdbc.write(df.filter(col("k") < 5), conn, "t_modes", WriteMode.Append)
    assert(Jdbc.read(spark, conn, "t_modes").count() == 15)
  }

  test("truncate-overwrite reuses the table; maxConnections caps write parallelism") {
    val df = spark.range(0, 30).select(col("id").as("k"))
    Jdbc.write(df, conn, "t_trunc", WriteMode.Overwrite)
    // truncate path: TRUNCATE TABLE + reload instead of DROP+CREATE
    Jdbc.write(df.filter(col("k") < 7), conn, "t_trunc", WriteMode.Overwrite,
      truncate = true, maxConnections = Some(2))
    assert(Jdbc.read(spark, conn, "t_trunc").count() == 7)
    // option map carries the knobs Spark's writer honors
    val opts = Jdbc.writeOptions(conn, "t", truncate = true,
      maxConnections = Some(2))
    assert(opts("truncate") == "true" && opts("numPartitions") == "2")
  }

  test("read pushes a dbtable subquery down to the store") {
    val df = spark.range(0, 50).select(col("id").as("k"),
      (col("id") * 2).as("v"))
    Jdbc.write(df, conn, "t_push", WriteMode.Overwrite)
    // dbtable can be a parenthesized pushdown query — the reference's
    // "SQL command" source mode (enhanced_json_mapper.py:1611-1713).
    // Spark's writer creates quoted (case-exact) column names, so the
    // store-side SQL quotes them too
    val q = Jdbc.read(spark, conn,
      """(SELECT "k", "v" FROM t_push WHERE "k" < 10) sub""")
    assert(q.count() == 10)
    assert(q.agg(sum("v")).as[Long].head() == (0 until 10).map(_ * 2).sum)
  }

  test("executePerRow with ZERO parameter columns runs once per row") {
    // a zero-parameter stored-proc/statement call is a legal SSIS
    // OLE DB Command shape ("EXEC dbo.Bump") — one execution per
    // input row, no binds
    val df = spark.range(0, 7).select(col("id").as("k"))
    Jdbc.write(spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(0L)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType)))),
      conn, "t_counter", WriteMode.Overwrite)
    val n = Jdbc.executePerRow(df, conn,
      """UPDATE t_counter SET "n" = "n" + 1""", Seq.empty, batchSize = 3)
    assert(n == 7, "one statement sent per input row")
    val after = Jdbc.read(spark, conn, "t_counter")
      .agg(sum("n")).as[Long].head()
    assert(after == 7, "each of the 7 executions bumped the counter")
  }
}
