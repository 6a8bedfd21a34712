package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ir.Component.WriteMode

/** JDBC source/sink — the reference's primary read/write path
  * (enhanced_json_mapper.py:1611-1713, 2076-2138: connection manager →
  * url/driver/credentials, dbtable or pushed-down query, fetch/batch
  * sizing). The live round-trip is exercised against embedded Apache
  * Derby (`org.apache.derby.jdbc.EmbeddedDriver` — the pure-Java
  * database Spark itself ships for its Hive metastore, so the driver is
  * already on every Spark classpath): JdbcSpec and q70 write a catalog
  * table through `write` and read it back through a partitioned `read`.
  * Any other store is the same code with a different ConnectionDef.
  *
  * Scale notes baked into the shape:
  *   - a partitioned read (`JdbcPartitioning`) is MANDATORY at scale:
  *     without partitionColumn bounds, Spark issues ONE query through
  *     one executor; with them, `numPartitions` parallel range queries.
  *   - `fetchsize` defaults low in most drivers (10 rows for MySQL) —
  *     always set it.
  *   - writes batch inserts (`batchsize`) and should target a staging
  *     table + server-side merge, not the live table (the StagedCommand
  *     pattern in graft.dag).
  */
object Jdbc {

  /** Embedded Derby writes `derby.log` (and `memory:` bookkeeping)
    * under `derby.system.home`, defaulting to the process cwd — point
    * it at a temp dir ONCE, before the first connection. Idempotent. */
  lazy val derbyHome: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_derby").toString
    System.setProperty("derby.system.home", d)
    d
  }

  /** ConnectionDef for an embedded in-JVM Derby database — the live
    * JDBC test/demo store (driver ships with Spark). */
  def derbyMemory(db: String): ConnectionDef = {
    derbyHome
    ConnectionDef(s"jdbc:derby:memory:$db;create=true",
      "org.apache.derby.jdbc.EmbeddedDriver")
  }

  /** Connection manager config — carries exactly what the reference's
    * ConnectionDef does. Password is pass-through: production injects a
    * secret reference, never a literal. */
  final case class ConnectionDef(
      url: String,
      driver: String,
      user: Option[String] = None,
      password: Option[String] = None,
      props: Map[String, String] = Map.empty)

  /** Range-partitioned read spec: `numPartitions` parallel queries over
    * `[lower, upper]` of `column` (a numeric/date indexed column). */
  final case class JdbcPartitioning(column: String, lower: Long, upper: Long,
      numPartitions: Int)

  /** The full option map a JDBC read needs — pure and unit-testable
    * without a driver on the classpath. */
  def readOptions(conn: ConnectionDef, dbtable: String,
      partitioning: Option[JdbcPartitioning] = None,
      fetchSize: Int = 10000): Map[String, String] =
    conn.props ++
      Map("url" -> conn.url, "driver" -> conn.driver,
        "dbtable" -> dbtable, "fetchsize" -> fetchSize.toString) ++
      conn.user.map("user" -> _) ++ conn.password.map("password" -> _) ++
      partitioning.fold(Map.empty[String, String])(p => Map(
        "partitionColumn" -> p.column,
        "lowerBound" -> p.lower.toString,
        "upperBound" -> p.upper.toString,
        "numPartitions" -> p.numPartitions.toString))

  /** Write options: batched inserts; isolation NONE where the store
    * allows it (bulk loads don't want transactional overhead).
    * `truncate` makes Overwrite issue TRUNCATE TABLE instead of
    * DROP+CREATE — preserving indexes, grants, and the exact server
    * DDL. `maxConnections` caps write parallelism (Spark coalesces to
    * `numPartitions` before writing): a 1000-executor job must not
    * open 1000 sessions against one database. */
  def writeOptions(conn: ConnectionDef, dbtable: String,
      batchSize: Int = 10000, truncate: Boolean = false,
      maxConnections: Option[Int] = None): Map[String, String] =
    conn.props ++
      Map("url" -> conn.url, "driver" -> conn.driver, "dbtable" -> dbtable,
        "batchsize" -> batchSize.toString, "isolationLevel" -> "NONE",
        "truncate" -> truncate.toString) ++
      maxConnections.map("numPartitions" -> _.toString) ++
      conn.user.map("user" -> _) ++ conn.password.map("password" -> _)

  def read(spark: SparkSession, conn: ConnectionDef, dbtable: String,
      partitioning: Option[JdbcPartitioning] = None,
      fetchSize: Int = 10000): DataFrame =
    spark.read.format("jdbc")
      .options(readOptions(conn, dbtable, partitioning, fetchSize)).load()

  def write(df: DataFrame, conn: ConnectionDef, dbtable: String,
      mode: WriteMode, batchSize: Int = 10000, truncate: Boolean = false,
      maxConnections: Option[Int] = None): Unit = {
    val m = mode match {
      case WriteMode.Append => "append"
      case WriteMode.Overwrite => "overwrite"
    }
    df.write.format("jdbc")
      .options(writeOptions(conn, dbtable, batchSize, truncate, maxConnections))
      .mode(m).save()
  }
}
