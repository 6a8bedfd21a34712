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

  /** SURVEY §7.3's per-row escape hatch, live: execute `sql` once per
    * input row as BATCHED JDBC (addBatch/executeBatch every
    * `batchSize`, one connection and one transaction per partition) —
    * for the OLE DB Command shapes that cannot be rewritten set-based
    * (arbitrary stored procedures, multi-statement side effects;
    * reference emits these as comments, enhanced_json_mapper.py:
    * 2541-2665). This is RBAR by nature — O(rows) statements against
    * ONE store — so it is the last resort after the MERGE rewrite
    * (ops.Mutations / StagedCommand): `maxConnections` caps session
    * fan-in precisely because a 1000-executor cluster must not open a
    * thousand sessions. `?` placeholders bind from `paramCols` in
    * order. Returns rows executed (per-statement update counts are
    * driver-specific for procs, so the contract is statements sent;
    * any failure rolls back its partition's open batch and throws).
    * Delivery is AT-LEAST-ONCE under task retries (a retried
    * partition re-sends its statements): key-addressed UPDATE/DELETE
    * and upsert-shaped procs are naturally idempotent; a blind INSERT
    * is not — route those through a staged write + server-side merge
    * instead. */
  def executePerRow(df: DataFrame, conn: ConnectionDef, sql: String,
      paramCols: Seq[String], batchSize: Int = 1000,
      maxConnections: Int = 4): Long = {
    import org.apache.spark.sql.functions.col
    // paramCols may be EMPTY: a zero-parameter stored-proc call is a
    // legal SSIS shape ("EXEC dbo.Refresh") — executed once per input
    // row with no binds.
    require(sql.count(_ == '?') == paramCols.size,
      s"$sql has ${sql.count(_ == '?')} placeholders for " +
        s"${paramCols.size} parameter columns")
    require(batchSize > 0 && maxConnections > 0,
      s"bad batchSize=$batchSize / maxConnections=$maxConnections")
    val acc = df.sparkSession.sparkContext.longAccumulator("per_row_cmds")
    val nCols = paramCols.size
    val (url, driver, user, password, props) =
      (conn.url, conn.driver, conn.user, conn.password, conn.props)
    df.select(paramCols.map(col): _*).coalesce(maxConnections)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          Class.forName(driver)
          val p = new java.util.Properties()
          props.foreach { case (k, v) => p.setProperty(k, v) }
          user.foreach(p.setProperty("user", _))
          password.foreach(p.setProperty("password", _))
          val c = java.sql.DriverManager.getConnection(url, p)
          try {
            c.setAutoCommit(false)
            val st = c.prepareStatement(sql)
            try {
              var n = 0L
              it.foreach { r =>
                var i = 0
                while (i < nCols) { st.setObject(i + 1, r.get(i)); i += 1 }
                st.addBatch()
                n += 1
                if (n % batchSize == 0) st.executeBatch()
              }
              if (n % batchSize != 0) st.executeBatch()
              c.commit()
              acc.add(n)
            } finally st.close()
          } catch {
            case e: Throwable =>
              try c.rollback() catch { case _: Exception => }
              throw e
          } finally c.close()
        }
      }
    acc.value
  }

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
