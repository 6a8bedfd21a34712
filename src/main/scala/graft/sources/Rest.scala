package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** REST/JSON payload source — the executing counterpart of the
  * reference's REST API source, which fetches a URL and applies a
  * JSONPath-ish `Filter` before building the frame
  * (parsing/data_engineering_parser.py:566-577,
  * mapping/enhanced_json_mapper.py:134-152).
  *
  * URL handling: `file://` URLs (and bare paths) read locally — this
  * build ships zero-egress, so `http(s)://` is rejected with an
  * explicit error rather than silently misread. The payload shape,
  * JSONPath navigation, and schema application are the semantics under
  * test; swapping the loader for an HTTP fetch touches nothing else.
  *
  * JSONPath subset (what the reference's Filter uses): `$` root,
  * `.field` member access, `[*]` array expansion — e.g. `$.data[*].id`.
  * Navigation compiles to native column ops (getField / explode), so a
  * large payload document set stays distributed: one input file per
  * partition, no driver-side JSON parsing.
  */
object Rest {

  sealed private[sources] trait Step
  private[sources] case class Field(name: String) extends Step
  private[sources] case object Wildcard extends Step

  /** Parse the supported JSONPath subset into navigation steps. */
  private[sources] def parsePath(p: String): Seq[Step] = {
    val s = p.trim
    require(s.startsWith("$"), s"JSONPath must start with '$$': $p")
    val steps = collection.mutable.Buffer.empty[Step]
    var i = 1
    while (i < s.length) {
      s(i) match {
        case '.' =>
          val end0 = s.indexWhere(c => c == '.' || c == '[', i + 1)
          val end = if (end0 < 0) s.length else end0
          val name = s.substring(i + 1, end)
          require(name.nonEmpty, s"empty field name in JSONPath: $p")
          steps += Field(name)
          i = end
        case '[' =>
          require(i + 2 < s.length && s(i + 1) == '*' && s(i + 2) == ']',
            s"only [*] is supported in JSONPath: $p")
          steps += Wildcard
          i += 3
        case other => sys.error(s"unexpected '$other' in JSONPath: $p")
      }
    }
    steps.toSeq
  }

  private def localPath(url: String): String =
    if (url.startsWith("file://")) url.stripPrefix("file://")
    else if (url.startsWith("http://") || url.startsWith("https://"))
      sys.error(s"Rest: http(s) fetch is not available in this build " +
        s"(zero egress) — stage the payload and use a file:// URL: $url")
    else url

  /** Read a JSON payload at `url`, navigate `jsonPath`, return a frame
    * of the selected records. `schemaDdl` casts the result columns by
    * NAME (JSON key order is not positional). */
  def read(spark: SparkSession, url: String, jsonPath: String = "$",
      schemaDdl: Option[String] = None): DataFrame = {
    // multiLine: a REST payload is one JSON document, not JSON-lines —
    // Spark surfaces a top-level array as one row per element
    val raw = spark.read.option("multiLine", "true").json(localPath(url))
    val steps0 = parsePath(jsonPath)
    // a leading [*] on a top-level-array document is identity: the
    // reader already exploded the array into rows
    val steps = steps0 match {
      case Wildcard +: rest => rest
      case other => other
    }
    var df = raw.select(struct(col("*")).as("__v"))
    steps.foreach {
      case Field(n) =>
        df = df.select(col("__v").getField(n).as("__v"))
      case Wildcard =>
        df = df.select(explode(col("__v")).as("__v"))
    }
    val expanded = df.schema.fields.head.dataType match {
      case _: StructType => df.select(col("__v.*"))
      case _: ArrayType =>
        sys.error(s"JSONPath $jsonPath ends on an array — add [*]")
      case _ => df.select(col("__v").as("value"))
    }
    schemaDdl.fold(expanded) { ddl =>
      val target = StructType.fromDDL(ddl)
      expanded.select(target.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    }
  }
}
