package graft.frontend

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Config-driven catalog/table name mapping for migrated packages —
  * the file-driven layer a migration user reaches for first: a
  * user-supplied JSON maps SSIS connection names to target schemas
  * plus per-table overrides, so a package's logical names resolve to
  * the migration's physical catalog WITHOUT editing the package.
  * Parity with the reference's schema mapper
  * (mapping/schema_mapper.py:79-131 `get_databricks_table_name`,
  * :133-163 `find_connection_for_table`, :165-250
  * `apply_mapping_to_sql`; file shape per
  * mapping/schema_mapping_template.json):
  *
  * {{{
  * { "connection_mappings": {
  *     "SRC_OLEDB": {
  *       "databricks_schema": "bronze",
  *       "table_mappings": { "dbo.SRC_InputTable": "src_inputtable" } } } }
  * }}}
  *
  * Resolution order (the reference's, schema_mapper.py:102-131):
  * exact table key → key matched by bare table name (schema prefix and
  * `[brackets]` stripped) → connection-level schema + bare name. A
  * mapped value containing '.' is already schema-qualified and wins
  * as-is; otherwise the connection's schema prefixes it. Connection
  * lookup is case-insensitive (:252-266). Unmapped names pass through
  * unchanged — a partial mapping file migrates a package
  * incrementally. */
final class SchemaMapping(
    conns: Seq[(String, SchemaMapping.ConnMapping)]) {
  import SchemaMapping._

  private def findConn(connection: String): Option[ConnMapping] =
    conns.collectFirst {
      case (k, m) if k.equalsIgnoreCase(connection) => m }

  /** Map `table` under `connection` — schema_mapper.py:79-131. */
  def mapTable(connection: String, table: String): String =
    findConn(connection).fold(table) { cm =>
      val norm = stripBrackets(table)
      val bare = extractTable(table)
      val hit = cm.tables.collectFirst {
        case (k, v) if stripBrackets(k).equalsIgnoreCase(norm) => v
      }.orElse(cm.tables.collectFirst {
        case (k, v) if extractTable(k).equalsIgnoreCase(bare) => v
      })
      hit match {
        case Some(v) if v.contains(".") => v
        case Some(v) => qualify(cm.schema, v)
        case None => qualify(cm.schema, bare)
      }
    }

  /** Map `table` with the owning connection INFERRED from the table
    * mappings (first connection whose table_mappings contain it,
    * exact-normalized or by bare name — schema_mapper.py:133-163);
    * no owner → unchanged. This is the hook shape `resolveTable` /
    * `writeTable` need: the executor hands them a bare table name. */
  def mapTable(table: String): String = {
    val norm = stripBrackets(table)
    val bare = extractTable(table)
    conns.collectFirst {
      case (conn, cm) if cm.tables.exists { case (k, _) =>
        stripBrackets(k).equalsIgnoreCase(norm) ||
          extractTable(k).equalsIgnoreCase(bare) } => conn
    }.fold(table)(conn => mapTable(conn, table))
  }

  /** Rewrite every mapped `schema.table` reference inside a SQL string
    * (longest-first so `dbo.X` wins over a bare `X`; bracket forms
    * covered) — schema_mapper.py:165-250's global replacement map. */
  def applyToSql(sql: String): String = {
    val repl: Seq[(String, String)] = conns.flatMap { case (_, cm) =>
      cm.tables.toSeq.flatMap { case (k, v) =>
        val target =
          if (v.contains(".")) v else qualify(cm.schema, v)
        val norm = stripBrackets(k)
        val bracketed = norm.split('.') match {
          case parts if parts.length > 1 =>
            parts.map(p => s"[$p]").mkString(".")
          case _ => s"[$norm]"
        }
        Seq(bracketed -> target, norm -> target,
          extractTable(k) -> target)
      }
    }
    repl.sortBy(-_._1.length).foldLeft(sql) { case (acc, (from, to)) =>
      // word-ish boundary: don't rewrite inside a longer identifier
      // or a name already rewritten into `to`
      acc.replaceAll(
        "(?i)(?<![\\w\\].])" + java.util.regex.Pattern.quote(from) +
          "(?![\\w\\[])",
        java.util.regex.Matcher.quoteReplacement(to))
    }
  }

  /** Route a context's table reads/writes through this mapping — the
    * `resolveTable` hook (DataFlowExec.scala:25) fed from the file,
    * which is how a migrated package runs against renamed targets
    * without edits (q174). */
  def context(base: graft.dag.PipelineContext): graft.dag.PipelineContext =
    new graft.dag.PipelineContext(base.spark,
      name => base.resolveTable(mapTable(name)),
      (name, df, mode) => base.writeTable(mapTable(name), df, mode),
      base.variables)

  /** Rewrite a parsed package so every RAW SQL STRING hits the mapped
    * names too: Execute SQL Tasks, data-flow SQL sources, and Lookup
    * SqlCommand references all run via `spark.sql` and never pass
    * through `resolveTable` (the reference rewrites them the same way,
    * schema_mapper.py:165-250). Name-carrying components (SourceTable,
    * Destination, StagedCommand, Fuzzy refs) are NOT touched here —
    * those names resolve through [[context]]'s hooks. */
  def rewrite(spec: graft.ir.PipelineSpec): graft.ir.PipelineSpec = {
    import graft.ir.CfTask._
    import graft.ir.Component.{Lookup, SourceQuery}
    def goFlow(flow: graft.ir.DataFlow): graft.ir.DataFlow =
      flow.copy(components = flow.components.map {
        case q: SourceQuery => q.copy(sql = applyToSql(q.sql))
        case l: Lookup if l.refSql.isDefined =>
          l.copy(refSql = l.refSql.map(applyToSql))
        case other => other
      })
    def go(ts: Seq[graft.ir.CfTask]): Seq[graft.ir.CfTask] = ts.map {
      case t: SqlTask => t.copy(sql = applyToSql(t.sql))
      case d: DataFlowTask => d.copy(flow = goFlow(d.flow))
      case f: ForEach => f.copy(body = go(f.body))
      case f: ForEachAdo => f.copy(body = go(f.body))
      case f: ForLoop => f.copy(body = go(f.body))
      case s: Sequence => s.copy(body = go(s.body))
      case other => other
    }
    spec.copy(tasks = go(spec.tasks))
  }
}

object SchemaMapping {

  final case class ConnMapping(schema: String,
      tables: Seq[(String, String)])

  private def qualify(schema: String, table: String): String =
    if (schema.isEmpty) table else s"$schema.$table"

  private[frontend] def stripBrackets(s: String): String =
    s.replace("[", "").replace("]", "")

  /** `dbo.X` / `[dbo].[X]` → `X` — schema_mapper.py `_extract_table_name`. */
  private[frontend] def extractTable(s: String): String = {
    val parts = stripBrackets(s).split('.')
    if (parts.isEmpty) stripBrackets(s) else parts.last
  }

  /** Parse the template's JSON shape. Connection ORDER is preserved
    * (first-match inference, like the reference's dict iteration). */
  def fromJson(json: String): SchemaMapping = {
    val root = new ObjectMapper().readTree(json)
    val cmNode = root.get("connection_mappings")
    require(cmNode != null && cmNode.isObject,
      "schema mapping JSON needs a 'connection_mappings' object " +
        "(see the reference's schema_mapping_template.json)")
    val conns = scala.collection.mutable.Buffer.empty[(String, ConnMapping)]
    cmNode.properties().forEach { e =>
      val conn = e.getKey
      val node = e.getValue
      val schema = Option(node.get("databricks_schema"))
        .map(_.asText).getOrElse("")
      val tables = scala.collection.mutable.Buffer.empty[(String, String)]
      Option(node.get("table_mappings")).foreach { tm: JsonNode =>
        tm.properties().forEach(t => tables += t.getKey -> t.getValue.asText)
      }
      conns += conn -> ConnMapping(schema, tables.toSeq)
    }
    new SchemaMapping(conns.toSeq)
  }

  def load(path: String): SchemaMapping =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))
}
