package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import scala.xml.{Utility, XML}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal native .xlsx reader/writer — OOXML is a ZIP of XML parts,
  * and both `java.util.zip` and `scala-xml` ship with Spark, so Excel
  * support needs no external library (the container has no POI). The
  * reference reads Excel via pandas read_excel
  * (enhanced_json_mapper.py:62-69,154-164) and writes it at
  * :2042-2138.
  *
  * Scale posture: Excel is a DRIVER-SIDE format by nature — the sheet
  * grid caps at 1,048,576 rows, so a single-machine parse is not a
  * scalability compromise. SSIS Excel sources are config/dimension
  * sheets; big data belongs in parquet/CSV, and the reader refuses
  * nothing but genuinely malformed files.
  *
  * Reader: sharedStrings + inline strings + numeric/bool cells; all
  * values surface as strings (header row optional), with an optional
  * DDL schema applied positionally — same contract as the CSV source.
  * Writer: inline strings (no sharedStrings table), one sheet.
  */
object Excel {

  private val SheetNs = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

  // ---------- read ----------

  /** Column index of an A1-style cell reference ("BC12" → 54). */
  private[sources] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1

  /** The worksheet part for a sheet selected by name or declared-order
    * index. Resolution goes through the workbook's relationship table
    * (sheet → r:id → rels target): the `sheetN.xml` part names are
    * assigned at creation and do NOT track reordering or deletion, so
    * positional part naming is only a fallback for workbooks without a
    * rels part. A trailing `$` on the name (the OLE DB rowset form
    * "Sheet1$") is ignored. */
  private def sheetPart(zip: ZipFile, path: String, sheet: Int,
      sheetName: Option[String]): String = {
    val viaRels = for {
      wbE <- Option(zip.getEntry("xl/workbook.xml"))
      relsE <- Option(zip.getEntry("xl/_rels/workbook.xml.rels"))
    } yield {
      val sheets = XML.load(zip.getInputStream(wbE)) \ "sheets" \ "sheet"
      val chosen = sheetName match {
        case Some(n) =>
          val clean = n.stripSuffix("$")
          sheets.find(s => (s \ "@name").text == clean).getOrElse(
            sys.error(s"Excel: no sheet '$clean' in $path " +
              s"(sheets: ${sheets.map(s => (s \ "@name").text)})"))
        case None => sheets.lift(sheet).getOrElse(
          sys.error(s"Excel: no sheet index $sheet in $path"))
      }
      val rid = chosen.attributes.iterator.collectFirst {
        case a: scala.xml.Attribute if a.key == "id" => a.value.text
      }.getOrElse(sys.error(s"Excel: sheet without r:id in $path"))
      val rels = XML.load(zip.getInputStream(relsE)) \ "Relationship"
      val target = rels.find(r => (r \ "@Id").text == rid)
        .map(r => (r \ "@Target").text)
        .getOrElse(sys.error(s"Excel: no relationship $rid in $path"))
      if (target.startsWith("/")) target.stripPrefix("/")
      else "xl/" + target
    }
    viaRels.getOrElse {
      require(sheetName.isEmpty,
        s"Excel: cannot resolve sheet by name without workbook rels in $path")
      s"xl/worksheets/sheet${sheet + 1}.xml"
    }
  }

  def read(spark: SparkSession, path: String, sheet: Int = 0,
      header: Boolean = true, schemaDdl: Option[String] = None,
      sheetName: Option[String] = None): DataFrame = {
    val zip = new ZipFile(path)
    try {
      val shared: IndexedSeq[String] =
        Option(zip.getEntry("xl/sharedStrings.xml")).map { e =>
          val x = XML.load(zip.getInputStream(e))
          (x \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
        }.getOrElse(IndexedSeq.empty)
      val part = sheetPart(zip, path, sheet, sheetName)
      val entry = Option(zip.getEntry(part))
        .getOrElse(sys.error(s"Excel: missing worksheet part $part in $path"))
      val x = XML.load(zip.getInputStream(entry))
      val rawRows: Seq[Array[String]] = (x \ "sheetData" \ "row").map { row =>
        // @r is OPTIONAL in OOXML: a cell without it sits immediately
        // after the previous cell (ordinal fallback), per the spec's
        // sequential-cell rule
        var nextIdx = 0
        val cells = (row \ "c").map { c =>
          val ref = (c \ "@r").text
          val idx = if (ref.nonEmpty && ref.exists(_.isLetter)) colIndex(ref)
                    else nextIdx
          nextIdx = idx + 1
          val v = (c \ "@t").text match {
            case "s" => shared((c \ "v").text.toInt)
            case "inlineStr" => (c \ "is" \ "t").text
            case "b" => if ((c \ "v").text == "1") "true" else "false"
            case _ => (c \ "v").text match { case "" => null; case s => s }
          }
          idx -> v
        }
        val width = cells.map(_._1).maxOption.fold(0)(_ + 1)
        val arr = Array.fill[String](width)(null)
        cells.foreach { case (i, v) => arr(i) = v }
        arr
      }
      require(rawRows.nonEmpty, s"Excel: empty sheet in $path")
      val width = rawRows.map(_.length).max
      def pad(a: Array[String]) = a.padTo(width, null: String)
      val names =
        if (header) pad(rawRows.head).zipWithIndex.map {
          case (n, i) => Option(n).getOrElse(s"col$i") }
        else (0 until width).map(i => s"col$i").toArray
      val dataRows = (if (header) rawRows.tail else rawRows)
        .map(r => Row.fromSeq(pad(r).toSeq))
      val stringSchema = StructType(names.map(StructField(_, StringType)).toSeq)
      val df = spark.createDataFrame(
        java.util.Arrays.asList(dataRows: _*), stringSchema)
      schemaDdl.fold(df) { ddl =>
        val target = StructType.fromDDL(ddl)
        require(target.size == df.columns.length,
          s"Excel: schema has ${target.size} fields, sheet has ${df.columns.length} columns")
        df.select(df.columns.zip(target.fields).map {
          case (c, f) => col(c).cast(f.dataType).as(f.name) }: _*)
      }
    } finally zip.close()
  }

  // ---------- write ----------

  private def esc(s: String): String = Utility.escape(s)

  private def cellXml(ref: String, v: Any): String = v match {
    case null => ""
    case n: (java.lang.Number) => s"""<c r="$ref"><v>$n</v></c>"""
    case b: java.lang.Boolean =>
      s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case other =>
      s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(other.toString)}</t></is></c>"""
  }

  private def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Write `df` as a one-sheet .xlsx with a header row. Collects to the
    * driver — see scaladoc for why that is the right call for this
    * format; refuses sheets over the Excel grid limit. */
  def write(df: DataFrame, path: String, sheetName: String = "Sheet1"): Unit = {
    // bound BEFORE collecting: limit(cap) pulls at most cap rows to the
    // driver, so an over-grid frame refuses instead of OOMing the
    // driver on an unbounded collect (the guard used to run after)
    val cap = 1048576
    val rows = df.limit(cap).collect()
    require(rows.length < cap, "Excel grid caps at 1,048,576 rows")
    val names = df.columns
    val sb = new StringBuilder
    sb ++= s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= s"""<worksheet xmlns="$SheetNs"><sheetData>"""
    sb ++= "<row r=\"1\">"
    names.zipWithIndex.foreach { case (n, i) => sb ++= cellXml(s"${colRef(i)}1", n) }
    sb ++= "</row>"
    rows.zipWithIndex.foreach { case (row, ri) =>
      sb ++= s"""<row r="${ri + 2}">"""
      (0 until row.length).foreach { ci =>
        if (!row.isNullAt(ci)) sb ++= cellXml(s"${colRef(ci)}${ri + 2}", row.get(ci))
      }
      sb ++= "</row>"
    }
    sb ++= "</sheetData></worksheet>"

    val parent = new java.io.File(path).getParentFile
    if (parent != null) parent.mkdirs()
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    try {
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      put("xl/workbook.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="$SheetNs" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
           |</workbook>""".stripMargin)
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)
      put("xl/worksheets/sheet1.xml", sb.toString)
    } finally zos.close()
  }
}
