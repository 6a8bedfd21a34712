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
    if (url.startsWith("file:")) {
      // java.net.URI so file:///p and authority forms both resolve to an
      // absolute path — a naive stripPrefix("file://") turns
      // file://host/p into the RELATIVE path "host/p"
      val u = new java.net.URI(url)
      val auth = Option(u.getAuthority).getOrElse("")
      require(auth.isEmpty || auth.equalsIgnoreCase("localhost"),
        s"Rest: non-local file URL authority '$auth' in $url")
      Option(u.getPath).filter(_.nonEmpty)
        .getOrElse(sys.error(s"Rest: no path in file URL $url"))
    } else if (url.startsWith("http://") || url.startsWith("https://"))
      sys.error(s"Rest: http(s) fetch is not available in this build " +
        s"(zero egress) — stage the payload and use a file:// URL: $url")
    else url

  /** Whether the payload document(s) at `path` are top-level JSON
    * arrays. Peeks only the first non-whitespace byte of each file via
    * the Hadoop FS (driver-side, O(files) tiny reads — the data path
    * stays distributed); mixed array/object payload sets are an error. */
  private def topLevelIsArray(spark: SparkSession, path: String): Boolean = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.getFileStatus(hPath)
    val files =
      if (root.isDirectory)
        fs.listStatus(hPath).filter(st => st.isFile &&
          !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
      else Array(root)
    val flags = files.map { st =>
      val in = fs.open(st.getPath)
      try {
        var c = in.read()
        while (c != -1 && Character.isWhitespace(c)) c = in.read()
        c == '['.toInt
      } finally in.close()
    }.toSeq.distinct
    require(flags.size <= 1,
      s"Rest: payload set at $path mixes top-level arrays and objects")
    flags.headOption.getOrElse(false)
  }

  /** Read a JSON payload at `url`, navigate `jsonPath`, return a frame
    * of the selected records. `schemaDdl` casts the result columns by
    * NAME (JSON key order is not positional). */
  def read(spark: SparkSession, url: String, jsonPath: String = "$",
      schemaDdl: Option[String] = None): DataFrame = {
    // multiLine: a REST payload is one JSON document, not JSON-lines —
    // Spark surfaces a top-level array as one row per element
    val path = localPath(url)
    val raw = spark.read.option("multiLine", "true").json(path)
    val steps0 = parsePath(jsonPath)
    // a leading [*] on a top-level-ARRAY document is identity (the
    // reader already exploded the array into rows); over a top-level
    // object it is a path error, not a silent identity
    val steps = steps0 match {
      case Wildcard +: rest =>
        if (!topLevelIsArray(spark, path))
          sys.error(s"JSONPath $jsonPath applies [*] to a top-level " +
            s"JSON object (payload at $url is not an array)")
        rest
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
