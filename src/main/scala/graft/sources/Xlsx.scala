package graft.sources

import java.io.{ByteArrayInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Excel `.xlsx` ingestion with ZERO extra dependencies — the
  * reference's actual input is an Excel workbook read by sheet name
  * (`pd.read_excel(initial_setup["excel_file_path"],
  * sheet_name="Sorted by Store #")`, `weekly alignments GQL
  * API.py:255`; the `.xlsx` discovery at ref:107). An xlsx is a ZIP
  * of XML parts, so JDK `ZipFile` + StAX cover it: workbook.xml
  * names the sheets, its rels map sheet → worksheet part,
  * sharedStrings.xml interns repeated text, and the worksheet part
  * carries rows of typed cells.
  *
  * Scale stance: the weekly workbook is CONTROL-PLANE data — one
  * zip, thousands of rows, inherently a single-file read (a zip's
  * central directory lives at the end; there is no record-level
  * split point, which is why Spark ships no xlsx source). It parses
  * on the driver and becomes a DataFrame via `createDataFrame`; the
  * 100 TB fact data never travels this path — it stays on the
  * splittable parquet/CSV scans. Cell-type coverage: shared strings
  * (`t="s"`), inline strings (`t="inlineStr"`), formula-cached
  * strings (`t="str"`), booleans (`t="b"`), and bare numeric cells;
  * all surface as strings (header row = column names), with typing
  * applied downstream exactly like the CSV path's declared schema.
  */
object Xlsx {

  private val xif: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    // zero-egress container + untrusted file: no DTDs, no externals
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** Read one sheet by NAME (the reference's `sheet_name=` semantics;
    * throws listing the available names on a miss) into a DataFrame:
    * first row = header, every column `StringType` — the caller
    * declares types downstream ([[AlignmentsFile.readCleaned]]),
    * keeping the same declared-schema discipline as the CSV path.
    */
  def readSheet(spark: SparkSession, path: String, sheetName: String): DataFrame = {
    val grid = readGrid(path, sheetName)
    require(grid.nonEmpty, s"sheet '$sheetName' of $path has no header row")
    val header = grid.head.zipWithIndex.map { case (h, i) =>
      h.getOrElse(s"_c$i") // unnamed header cell → positional name
    }
    val width = header.length
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    val rows = grid.tail.map { r =>
      Row.fromSeq((0 until width).map(i => r.lift(i).flatten.orNull))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }

  /** The raw cell grid of a sheet: row-major, `None` = empty cell.
    * Rows are dense up to the rightmost populated cell of each row.
    */
  def readGrid(path: String, sheetName: String): Vector[Vector[Option[String]]] = {
    val zip = new ZipFile(path)
    try {
      def part(name: String): Option[Array[Byte]] =
        Option(zip.getEntry(name)).map { e =>
          val in = zip.getInputStream(e)
          try in.readAllBytes() finally in.close()
        }
      gridFromParts(part, path, sheetName)
    } finally zip.close()
  }

  /** [[readGrid]] over workbook BYTES — the executor-side arm used by
    * [[readSheetDir]], where files arrive as `binaryFile` rows rather
    * than local paths. One `ZipInputStream` pass collects the ≤4
    * needed parts; per-task memory is bounded by one workbook.
    */
  def readGridBytes(
      bytes: Array[Byte], sheetName: String,
      label: String,
      maxCells: Long = Long.MaxValue,
      maxPartBytes: Long = Long.MaxValue): Vector[Vector[Option[String]]] = {
    val parts = scala.collection.mutable.Map.empty[String, Array[Byte]]
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    // Cumulative budgets across the whole zip walk (r11 advice): the
    // per-part cap alone still lets a hostile workbook with thousands
    // of entries each just UNDER maxPartBytes exhaust executor memory
    // before any throw fires. Total decompressed bytes are bounded by
    // 4× the part cap (a legitimate workbook holds exactly the ≤4
    // parts the reader needs plus small metadata), and the entry
    // count by a fixed 4096 (real books carry tens of entries) — both
    // throws land in the same quarantine path as the per-part cap.
    // saturate, don't multiply: any part cap above Long.MaxValue/4
    // would overflow 4× to a negative budget and quarantine every
    // workbook's first entry (r12 advice)
    val maxTotalBytes =
      if (maxPartBytes > Long.MaxValue / 4) Long.MaxValue else 4L * maxPartBytes
    val maxEntries = 4096
    var totalBytes = 0L
    var entries = 0
    try {
      var e = zin.getNextEntry
      while (e != null) {
        // the entry's DECLARED size is attacker-controlled (and -1 in
        // streaming mode) — bound by what is actually read, so a
        // zip-bombed part throws before materializing
        if (!e.isDirectory) {
          entries += 1
          if (entries > maxEntries)
            throw new IllegalArgumentException(
              s"$label has more than $maxEntries zip entries " +
                "(hostile workbook quarantined rather than walked)")
          val part = readBounded(zin, maxPartBytes, s"$label!${e.getName}")
          totalBytes += part.length
          if (totalBytes > maxTotalBytes)
            throw new IllegalArgumentException(
              s"$label decompresses past the $maxTotalBytes-byte " +
                "whole-workbook budget (multi-part zip bomb " +
                "quarantined rather than materialized)")
          parts(e.getName) = part
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    gridFromParts(parts.get, label, sheetName, maxCells)
  }

  /** `readAllBytes` with a hard cap — throws (rather than OOMs the
    * executor) when a part decompresses past `cap`.
    */
  private def readBounded(
      in: java.io.InputStream, cap: Long, what: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      if (out.size() > cap)
        throw new IllegalArgumentException(
          s"$what decompresses past the $cap-byte part cap")
      n = in.read(buf)
    }
    out.toByteArray
  }

  /** Shared workbook-part walk behind both grid readers: workbook →
    * sheet rel → shared strings → sheet XML.
    */
  private def gridFromParts(
      part: String => Option[Array[Byte]], path: String,
      sheetName: String,
      maxCells: Long = Long.MaxValue): Vector[Vector[Option[String]]] = {
    val wb = part("xl/workbook.xml").getOrElse(
      throw new IllegalArgumentException(s"$path: not an xlsx (no xl/workbook.xml)"))
    val sheets = parseWorkbookSheets(wb) // name -> r:id
    val rid = sheets.getOrElse(sheetName,
      throw new IllegalArgumentException(
        s"$path has no sheet '$sheetName'; sheets: ${sheets.keys.mkString(", ")}"))
    val rels = parseRels(part("xl/_rels/workbook.xml.rels").getOrElse(
      throw new IllegalArgumentException(s"$path: missing workbook rels")))
    val target = rels.getOrElse(rid,
      throw new IllegalArgumentException(s"$path: no rel for sheet id $rid"))
    val sheetPath =
      if (target.startsWith("/")) target.stripPrefix("/") else s"xl/$target"
    val shared = part("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(Vector.empty)
    val sheetXml = part(sheetPath).getOrElse(
      throw new IllegalArgumentException(s"$path: missing worksheet part $sheetPath"))
    parseSheet(sheetXml, shared, maxCells)
  }

  /** DISTRIBUTED many-workbook ingestion (r10, closing the r9 gap):
    * read `sheetName` from EVERY .xlsx under `dir` and union the rows
    * to the DECLARED `columns`, mapped per workbook BY HEADER NAME —
    * workbooks may order their columns differently or carry extras;
    * a declared column a workbook lacks yields nulls.
    *
    * Scale shape: a `binaryFile` scan ships each workbook's bytes to
    * an executor task (Spark packs small files into shared tasks via
    * `maxPartitionBytes`; directory listing is driver-side metadata
    * only), and the same StAX parser that reads the weekly file runs
    * per task — a directory of thousands of workbooks parses with
    * full cluster parallelism and per-task memory bounded by one
    * workbook. The driver-side [[readSheet]] remains the right arm
    * for the single weekly file (control-plane sized, no job needed).
    *
    * `withFile = true` appends a `src_file` provenance column (file
    * name) for manifest-style audits.
    */
  def readSheetDir(
      spark: SparkSession, dir: String, sheetName: String,
      columns: Seq[String], withFile: Boolean = false): DataFrame = {
    val cols = columns.toVector
    val base = StructType(cols.map(c => StructField(c, StringType, nullable = true)))
    val schema =
      if (withFile) base.add(StructField("src_file", StringType, nullable = false))
      else base
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(dir)
      .select("path", "content")
    val rows = bin.rdd.flatMap { r =>
      val path = r.getString(0)
      val bytes = r.getAs[Array[Byte]](1)
      val grid = readGridBytes(bytes, sheetName, path)
      if (grid.isEmpty) Iterator.empty
      else {
        val header = grid.head.zipWithIndex.map { case (h, i) =>
          h.getOrElse(s"_c$i")
        }
        val idx = cols.map(header.indexOf)
        val fname = path.substring(path.lastIndexOf('/') + 1)
        grid.tail.iterator.map { row =>
          val vals = idx.map(i => if (i < 0) null else row.lift(i).flatten.orNull)
          Row.fromSeq(if (withFile) vals :+ fname else vals)
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** [[readSheetDir]] with the `src_jsonl_events` QUARANTINE stance
    * (r10 verdict item 5): in a 1000-book directory one corrupt zip,
    * truncated workbook, missing sheet, or zip-bombed/oversized sheet
    * must neither kill the job (the strict reader's task throw) nor
    * vanish silently. Each workbook parses under a per-file
    * try/catch; a failing file contributes ONE side row — every data
    * column null, `src_file` set, `error` carrying the reason — so
    * the quarantine is auditable and the input file set is conserved
    * (every workbook is either data rows or exactly one error row;
    * empty-but-valid books contribute nothing, like the strict path).
    *
    * Resource caps turn would-be executor OOMs into quarantine
    * rows: `maxPartBytes` bounds what any zip part may DECOMPRESS to
    * (declared sizes are attacker-controlled; the bound is enforced
    * on actual bytes read), a 4×`maxPartBytes` WHOLE-WORKBOOK budget
    * plus a 4096-entry cap bound the zip walk itself (r11 advice: a
    * many-entry bomb with every part just under the per-part cap must
    * quarantine too), and `maxCells` bounds the materialized grid — a
    * single multi-GB sheet quarantines instead of materializing per
    * task.
    */
  def readSheetDirQuarantined(
      spark: SparkSession, dir: String, sheetName: String,
      columns: Seq[String],
      maxCells: Long = 10000000L,
      maxPartBytes: Long = 256L * 1024 * 1024): DataFrame = {
    val cols = columns.toVector
    val schema = StructType(
      cols.map(c => StructField(c, StringType, nullable = true))
        :+ StructField("src_file", StringType, nullable = false)
        :+ StructField("error", StringType, nullable = true))
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(dir)
      .select("path", "content")
    val rows = bin.rdd.flatMap { r =>
      val path = r.getString(0)
      val fname = path.substring(path.lastIndexOf('/') + 1)
      try {
        val grid = readGridBytes(r.getAs[Array[Byte]](1), sheetName, path,
          maxCells, maxPartBytes)
        if (grid.isEmpty) Iterator.empty
        else {
          val header = grid.head.zipWithIndex.map { case (h, i) =>
            h.getOrElse(s"_c$i")
          }
          val idx = cols.map(header.indexOf)
          grid.tail.iterator.map { row =>
            Row.fromSeq(
              idx.map(i => if (i < 0) null else row.lift(i).flatten.orNull)
                :+ fname :+ null)
          }
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          val msg = s"${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("")
          Iterator.single(
            Row.fromSeq(cols.map(_ => null) :+ fname :+ msg.take(300)))
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** List the sheet names of a workbook (reference:107 discovers the
    * weekly file, then its sheet by name).
    */
  def sheetNames(path: String): Seq[String] = {
    val zip = new ZipFile(path)
    try {
      val e = Option(zip.getEntry("xl/workbook.xml")).getOrElse(
        throw new IllegalArgumentException(s"$path: not an xlsx"))
      val in = zip.getInputStream(e)
      val bytes = try in.readAllBytes() finally in.close()
      parseWorkbookSheets(bytes).keys.toSeq
    } finally zip.close()
  }

  // ---- XML part parsers (StAX pull, constant memory per event) ----

  private def reader(bytes: Array[Byte]): XMLStreamReader =
    xif.createXMLStreamReader(new ByteArrayInputStream(bytes), "UTF-8")

  /** `<sheet name=".." r:id="rIdN"/>` entries, in workbook order. */
  private def parseWorkbookSheets(bytes: Array[Byte]): Map[String, String] = {
    val r = reader(bytes)
    val out = mutable.LinkedHashMap.empty[String, String]
    try while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet") {
        var name: String = null
        var rid: String = null
        (0 until r.getAttributeCount).foreach { i =>
          r.getAttributeLocalName(i) match {
            case "name" => name = r.getAttributeValue(i)
            case "id" => rid = r.getAttributeValue(i) // r:id — ns-qualified
            case _ =>
          }
        }
        if (name != null && rid != null) out.put(name, rid)
      }
    } finally r.close()
    out.toMap
  }

  /** `<Relationship Id=".." Target=".."/>` map. */
  private def parseRels(bytes: Array[Byte]): Map[String, String] = {
    val r = reader(bytes)
    val out = mutable.HashMap.empty[String, String]
    try while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship") {
        var id: String = null
        var target: String = null
        (0 until r.getAttributeCount).foreach { i =>
          r.getAttributeLocalName(i) match {
            case "Id" => id = r.getAttributeValue(i)
            case "Target" => target = r.getAttributeValue(i)
            case _ =>
          }
        }
        if (id != null && target != null) out.put(id, target)
      }
    } finally r.close()
    out.toMap
  }

  /** `<si>` entries: concatenate every `<t>` run inside each item
    * (plain and rich-text runs both reduce to their `t` text).
    */
  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val r = reader(bytes)
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT =>
        r.getLocalName match {
          case "si" => inSi = true; cur.clear()
          case "t" if inSi => inT = true
          case _ =>
        }
      case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
        cur.append(r.getText)
      case XMLStreamConstants.END_ELEMENT =>
        r.getLocalName match {
          case "t" => inT = false
          case "si" => inSi = false; out += cur.toString
          case _ =>
        }
      case _ =>
    } finally r.close()
    out.result()
  }

  /** Worksheet rows: `<row>` of `<c r="B3" t="s|str|inlineStr|b">`
    * with `<v>` (or `<is><t>` for inline). Cells may be sparse; the
    * `r` reference gives the true column. Numeric cells pass through
    * as their raw lexical value (no float re-formatting — what the
    * file says is what the frame gets).
    */
  private def parseSheet(
      bytes: Array[Byte], shared: Vector[String],
      maxCells: Long = Long.MaxValue): Vector[Vector[Option[String]]] = {
    val r = reader(bytes)
    val rows = Vector.newBuilder[Vector[Option[String]]]
    var totalCells = 0L
    var cells: mutable.ArrayBuffer[Option[String]] = null
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    val v = new StringBuilder
    var sawV = false
    var lastCol = -1
    def endCell(): Unit = if (cells != null && cellCol >= 0) {
      // OOXML's own column bound (XFD = 16384) — a hostile 'r' ref
      // must not force a multi-GB sparse-fill of one row
      if (cellCol >= 16384)
        throw new IllegalArgumentException(
          s"cell column $cellCol beyond the OOXML XFD bound")
      while (cells.length <= cellCol) cells += None
      val raw = v.toString
      val value =
        if (!sawV) None
        else cellType match {
          case "s" =>
            // a corrupt shared-string ref fails loudly either way —
            // silently dropping the cell (the old out-of-range path)
            // and crashing with a bare NumberFormatException (the old
            // non-numeric path) were inconsistent degradations
            val i =
              try raw.trim.toInt
              catch {
                case _: NumberFormatException =>
                  throw new IllegalArgumentException(
                    s"corrupt shared-string index '$raw' in cell at column $cellCol")
              }
            if (i < 0 || i >= shared.length)
              throw new IllegalArgumentException(
                s"shared-string index $i out of range (${shared.length} " +
                  s"entries) in cell at column $cellCol")
            Some(shared(i))
          case "b" => Some(if (raw.trim == "1") "true" else "false")
          case _ => Some(raw) // "", "str", "inlineStr", "n": lexical value
        }
      cells(cellCol) = value
      lastCol = cellCol
      cellCol = -1
    }
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT =>
        r.getLocalName match {
          case "row" =>
            cells = mutable.ArrayBuffer.empty[Option[String]]
            lastCol = -1
          case "c" =>
            // OOXML permits omitting the 'r' ref, meaning "the column
            // after the previous cell" — defaulting to 0 would pile
            // every unreferenced cell onto column 0
            cellCol = lastCol + 1; cellType = ""; v.clear(); sawV = false
            (0 until r.getAttributeCount).foreach { i =>
              r.getAttributeLocalName(i) match {
                case "r" => cellCol = colIndex(r.getAttributeValue(i))
                case "t" => cellType = r.getAttributeValue(i)
                case _ =>
              }
            }
          case "v" => inV = true; sawV = true
          case "t" if cellType == "inlineStr" => inIsT = true; sawV = true
          case _ =>
        }
      case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
          if inV || inIsT =>
        v.append(r.getText)
      case XMLStreamConstants.END_ELEMENT =>
        r.getLocalName match {
          case "v" => inV = false
          case "t" if inIsT => inIsT = false
          case "c" => endCell()
          case "row" =>
            if (cells != null) {
              totalCells += math.max(cells.length.toLong, 1L)
              if (totalCells > maxCells)
                throw new IllegalArgumentException(
                  s"sheet exceeds the $maxCells-cell cap (oversized " +
                    "workbook quarantined rather than materialized)")
              rows += cells.toVector
            }
            cells = null
          case _ =>
        }
      case _ =>
    } finally r.close()
    rows.result()
  }

  /** "BC7" → 0-based column 54 (letters only; digits = row). */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    math.max(acc - 1, 0)
  }

  // ---- minimal writer (fixtures + round-trip tests; emits the real
  // part layout with a sharedStrings table so the reader's shared-
  // string path is what gets exercised) ----

  /** A written cell: numeric (raw lexical), string, or empty. */
  sealed trait Cell
  final case class Num(raw: String) extends Cell
  final case class Str(s: String) extends Cell
  case object Empty extends Cell

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  private[graft] def colRef(c: Int): String = {
    var n = c + 1
    val sb = new StringBuilder
    while (n > 0) {
      val rem = (n - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  /** Write a single-sheet workbook. Strings intern through a shared-
    * strings table (the layout pandas/openpyxl emit); numbers are
    * bare `<v>` cells; `Empty` cells are omitted (sparse row).
    */
  def write(path: String, sheetName: String, rows: Seq[Seq[Cell]]): Unit = {
    val sstIndex = mutable.LinkedHashMap.empty[String, Int]
    rows.flatten.foreach {
      case Str(s) => sstIndex.getOrElseUpdate(s, sstIndex.size)
      case _ =>
    }
    val sheetRows = rows.zipWithIndex.map { case (r, ri) =>
      val cs = r.zipWithIndex.collect {
        case (Num(raw), ci) =>
          s"""<c r="${colRef(ci)}${ri + 1}"><v>${xmlEscape(raw)}</v></c>"""
        case (Str(s), ci) =>
          s"""<c r="${colRef(ci)}${ri + 1}" t="s"><v>${sstIndex(s)}</v></c>"""
      }
      s"""<row r="${ri + 1}">${cs.mkString}</row>"""
    }
    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
          |</Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
           |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
          |</Relationships>""".stripMargin,
      "xl/sharedStrings.xml" -> {
        val sis = sstIndex.keys
          .map(s => s"""<si><t xml:space="preserve">${xmlEscape(s)}</t></si>""")
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sstIndex.size}" uniqueCount="${sstIndex.size}">${sis.mkString}</sst>""".stripMargin
      },
      "xl/worksheets/sheet1.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
           |<sheetData>${sheetRows.mkString}</sheetData>
           |</worksheet>""".stripMargin)
    val out = new ZipOutputStream(new FileOutputStream(path))
    try parts.foreach { case (name, content) =>
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes(UTF_8))
      out.closeEntry()
    } finally out.close()
  }
}
