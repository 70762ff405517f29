package graft.sinks

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.{DataFrame, Row}

/** Minimal single-sheet .xlsx writer — no dependencies (SpreadsheetML is a
  * zip of XML parts; `java.util.zip` ships with the JDK).
  *
  * The reference exports every result frame to xlsx alongside csv
  * (`mean_features.py:60-61` `to_excel`/`to_csv`); round 1/2 excluded xlsx
  * for lack of an offline library. This closes that gap for the same use
  * the reference makes of it: a DRIVER-SIDE export of a small result table
  * (entity-grain features, metric summaries) — guarded by `maxRows`, never
  * a distributed sink. Numbers are written as native numeric cells,
  * booleans as boolean cells, everything else as inline strings (no shared
  * string table — simpler, and streaming-friendly), nulls as blank cells.
  *
  * Determinism: output bytes are a pure function of the row sequence — zip
  * entry timestamps are pinned to epoch so re-exports are byte-identical
  * (the same property the parquet/oracle gates rely on elsewhere).
  */
object Xlsx {

  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => () // illegal in XML 1.0
      case c => sb.append(c)
    }
    sb.toString
  }

  /** 0-based column index → A1-style letters. */
  private[graft] def colLetters(i: Int): String = {
    var n = i
    val sb = new StringBuilder
    while (n >= 0) {
      sb.insert(0, ('A' + n % 26).toChar)
      n = n / 26 - 1
    }
    sb.toString
  }

  private def cellXml(ref: String, v: Any): String = v match {
    case null => ""
    case n: Byte => s"""<c r="$ref" t="n"><v>$n</v></c>"""
    case n: Short => s"""<c r="$ref" t="n"><v>$n</v></c>"""
    case n: Int => s"""<c r="$ref" t="n"><v>$n</v></c>"""
    case n: Long => s"""<c r="$ref" t="n"><v>$n</v></c>"""
    // NaN/Infinity are not valid SpreadsheetML numeric cells (Excel would
    // reject or "repair" the file) — emit a blank cell, mirroring
    // evaluationJson's NaN→null on degenerate folds
    case n: Float if n.isNaN || n.isInfinite => ""
    case n: Double if n.isNaN || n.isInfinite => ""
    case n: Float => s"""<c r="$ref" t="n"><v>$n</v></c>"""
    case n: Double => s"""<c r="$ref" t="n"><v>$n</v></c>"""
    case n: java.math.BigDecimal => s"""<c r="$ref" t="n"><v>$n</v></c>"""
    case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case s => s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(s.toString)}</t></is></c>"""
  }

  private def rowXml(r: Int, values: Seq[Any]): String =
    values.zipWithIndex.map { case (v, c) => cellXml(s"${colLetters(c)}$r", v) }
      .mkString(s"""<row r="$r">""", "", "</row>")

  private val ContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
      |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
      |</Types>""".stripMargin

  private val RootRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
      |</Relationships>""".stripMargin

  private def workbookXml(sheet: String) =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
       |<sheets><sheet name="${xmlEscape(sheet)}" sheetId="1" r:id="rId1"/></sheets>
       |</workbook>""".stripMargin

  private val WorkbookRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
      |</Relationships>""".stripMargin

  /** Write `df` (header row + data rows) to a single-sheet xlsx at `path`.
    * Collects to the driver — `maxRows` fails fast on misuse as a big-data
    * sink (mirroring labelEncode's broadcast guard). Rows are ordered by
    * the DataFrame's row order; pass a sorted frame for a stable artifact. */
  def write(df: DataFrame, path: String, sheet: String = "Sheet1",
            maxRows: Int = 100000): Unit = {
    val rows: Array[Row] = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"Xlsx.write: more than $maxRows rows — xlsx is a driver-side artifact " +
        "export, not a distributed sink (write parquet/csv instead)")
    val header = rowXml(1, df.columns.toSeq)
    val body = rows.iterator.zipWithIndex
      .map { case (r, i) => rowXml(i + 2, r.toSeq) }
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def entry(name: String, content: Iterator[String]): Unit = {
      val e = new ZipEntry(name)
      e.setTime(0L) // pinned: byte-identical re-exports
      zos.putNextEntry(e)
      content.foreach(s => zos.write(s.getBytes(StandardCharsets.UTF_8)))
      zos.closeEntry()
    }
    try {
      entry("[Content_Types].xml", Iterator.single(ContentTypes))
      entry("_rels/.rels", Iterator.single(RootRels))
      entry("xl/workbook.xml", Iterator.single(workbookXml(sheet)))
      entry("xl/_rels/workbook.xml.rels", Iterator.single(WorkbookRels))
      entry("xl/worksheets/sheet1.xml",
        Iterator.single("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" + header) ++
          body ++ Iterator.single("</sheetData></worksheet>"))
    } finally zos.close()
  }

  /** The reference's dual-sink idiom (`to_excel` + `to_csv` side by side):
    * xlsx artifact + a real distributed csv (header, single file only when
    * the caller already bounded the frame). */
  def writeWithCsv(df: DataFrame, dir: String, name: String,
                   maxRows: Int = 100000): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    write(df, s"$dir/$name.xlsx", sheet = name, maxRows = maxRows)
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$dir/$name.csv")
  }
}
