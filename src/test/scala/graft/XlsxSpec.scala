package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.sources.{AlignmentsFile, Xlsx}

class XlsxSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val f = java.io.File.createTempFile(name, ".xlsx")
    f.deleteOnExit()
    f.getAbsolutePath
  }

  test("write → readGrid round-trips cells, empties and cell types") {
    val p = tmp("roundtrip")
    Xlsx.write(p, "Sheet A", Seq(
      Seq(Xlsx.Str("h1"), Xlsx.Str("h2"), Xlsx.Str("h3")),
      Seq(Xlsx.Str("a & <b>"), Xlsx.Num("12.5"), Xlsx.Empty),
      Seq(Xlsx.Empty, Xlsx.Str("dup"), Xlsx.Str("dup"))))
    val grid = Xlsx.readGrid(p, "Sheet A")
    assert(grid == Vector(
      Vector(Some("h1"), Some("h2"), Some("h3")),
      Vector(Some("a & <b>"), Some("12.5")),
      Vector(None, Some("dup"), Some("dup"))))
  }

  test("readSheet: header row names columns; sheet-name miss lists available sheets") {
    val p = tmp("sheetname")
    Xlsx.write(p, "Sorted by Store #", Seq(
      Seq(Xlsx.Str("region"), Xlsx.Str("unit")),
      Seq(Xlsx.Str("R1"), Xlsx.Num("7.25")),
      Seq(Xlsx.Str("R2"), Xlsx.Empty)))
    val df = Xlsx.readSheet(spark, p, "Sorted by Store #")
    assert(df.columns.toSeq == Seq("region", "unit"))
    assert(df.as[(String, String)].collect().toSet ==
      Set(("R1", "7.25"), ("R2", null)))
    assert(Xlsx.sheetNames(p) == Seq("Sorted by Store #"))
    val e = intercept[IllegalArgumentException] {
      Xlsx.readSheet(spark, p, "No Such Sheet")
    }
    assert(e.getMessage.contains("Sorted by Store #"))
  }

  test("foreign cell types parse: inlineStr, cached formula strings, booleans, sparse refs") {
    // hand-built worksheet exercising shapes our writer doesn't emit
    // (openpyxl/Excel do): inline strings, t="str", t="b", sparse
    // cells addressed only by reference, rich-text shared strings
    val p = tmp("foreign")
    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/></Types>""",
      "_rels/.rels" ->
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""",
      "xl/workbook.xml" ->
        """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="W" sheetId="1" r:id="rId1"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/></Relationships>""",
      "xl/sharedStrings.xml" ->
        // rich-text run: two <r><t> fragments concatenate
        """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="1" uniqueCount="1"><si><r><t>rich </t></r><r><t>text</t></r></si></sst>""",
      "xl/worksheets/sheet1.xml" ->
        """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
          |<row r="1"><c r="A1" t="inlineStr"><is><t>inline!</t></is></c><c r="C1" t="str"><v>=cached</v></c></row>
          |<row r="2"><c r="B2" t="b"><v>1</v></c><c r="D2"><v>3.14</v></c><c r="E2" t="s"><v>0</v></c></row>
          |</sheetData></worksheet>""".stripMargin)
    val out = new ZipOutputStream(new java.io.FileOutputStream(p))
    try parts.foreach { case (n, c) =>
      out.putNextEntry(new ZipEntry(n)); out.write(c.getBytes(UTF_8)); out.closeEntry()
    } finally out.close()
    val grid = Xlsx.readGrid(p, "W")
    assert(grid == Vector(
      Vector(Some("inline!"), None, Some("=cached")),
      Vector(None, Some("true"), None, Some("3.14"), Some("rich text"))))
  }

  test("cells without an 'r' ref take the next column; corrupt shared-string refs fail loudly") {
    def workbook(p: String, sheetXml: String): Unit = {
      val parts = Seq(
        "[Content_Types].xml" ->
          """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/></Types>""",
        "_rels/.rels" ->
          """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""",
        "xl/workbook.xml" ->
          """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="W" sheetId="1" r:id="rId1"/></sheets></workbook>""",
        "xl/_rels/workbook.xml.rels" ->
          """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/></Relationships>""",
        "xl/sharedStrings.xml" ->
          """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="1" uniqueCount="1"><si><t>only</t></si></sst>""",
        "xl/worksheets/sheet1.xml" -> sheetXml)
      val out = new ZipOutputStream(new java.io.FileOutputStream(p))
      try parts.foreach { case (n, c) =>
        out.putNextEntry(new ZipEntry(n)); out.write(c.getBytes(UTF_8)); out.closeEntry()
      } finally out.close()
    }
    // spec-legal: no 'r' anywhere → sequential columns; mixed: an
    // explicit C2 then an unreferenced cell lands on D2, not column 0
    val p1 = tmp("noref")
    workbook(p1,
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row><c><v>1</v></c><c><v>2</v></c><c><v>3</v></c></row>
        |<row><c r="C2"><v>9</v></c><c><v>8</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    assert(Xlsx.readGrid(p1, "W") == Vector(
      Vector(Some("1"), Some("2"), Some("3")),
      Vector(None, None, Some("9"), Some("8"))))
    // corrupt shared-string refs: out-of-range and non-numeric both
    // raise IllegalArgumentException (no silent drop, no bare NFE)
    val p2 = tmp("badss1")
    workbook(p2,
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    val e1 = intercept[IllegalArgumentException](Xlsx.readGrid(p2, "W"))
    assert(e1.getMessage.contains("out of range"))
    val p3 = tmp("badss2")
    workbook(p3,
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>zap</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    val e2 = intercept[IllegalArgumentException](Xlsx.readGrid(p3, "W"))
    assert(e2.getMessage.contains("zap"))
  }

  test("column reference arithmetic: letters ↔ 0-based index, incl. multi-letter") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA12") == 26)
    assert(Xlsx.colIndex("BC7") == 54)
    (0 until 200).foreach { i =>
      assert(Xlsx.colIndex(Xlsx.colRef(i) + "1") == i, s"round-trip $i")
    }
  }

  test("readSheetDirQuarantined: corrupt/truncated/oversized books become error rows") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx_q").toFile
    dir.deleteOnExit()
    val cols = Seq("region", "unit")
    def book(name: String, rows: Int): java.io.File = {
      val f = new java.io.File(dir, name)
      Xlsx.write(f.getAbsolutePath, "Alignments",
        Seq(Seq(Xlsx.Str("region"), Xlsx.Str("unit"))) ++
          (1 to rows).map(i => Seq(Xlsx.Str(s"R$i"), Xlsx.Num(i.toString))))
      f
    }
    book("good1.xlsx", 3)
    val g2 = book("good2.xlsx", 2)
    // corrupt: not a zip at all
    java.nio.file.Files.write(new java.io.File(dir, "corrupt.xlsx").toPath,
      "this is not a zip archive".getBytes(UTF_8))
    // truncated: a valid book cut mid-archive
    val full = java.nio.file.Files.readAllBytes(g2.toPath)
    java.nio.file.Files.write(new java.io.File(dir, "truncated.xlsx").toPath,
      java.util.Arrays.copyOf(full, full.length / 2))
    // oversized: 40 data rows x 2 cells blows a 50-cell cap
    book("oversized.xlsx", 40)
    // wrong sheet name: valid workbook, no "Alignments" sheet
    val ws = new java.io.File(dir, "wrongsheet.xlsx")
    Xlsx.write(ws.getAbsolutePath, "Other",
      Seq(Seq(Xlsx.Str("region")), Seq(Xlsx.Str("X"))))

    val got = Xlsx.readSheetDirQuarantined(
      spark, dir.getAbsolutePath, "Alignments", cols, maxCells = 50L)
    val good = got.filter(col("error").isNull)
    val bad = got.filter(col("error").isNotNull)
      .select("src_file", "error").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // good books fully parsed (3 + 2 data rows), nothing dropped
    assert(good.count() == 5L)
    assert(good.select("src_file").distinct().collect().map(_.getString(0)).toSet
      == Set("good1.xlsx", "good2.xlsx"))
    // each bad book contributes exactly one accounted error row
    assert(bad.keySet ==
      Set("corrupt.xlsx", "truncated.xlsx", "oversized.xlsx", "wrongsheet.xlsx"),
      s"quarantine set: $bad")
    assert(bad("oversized.xlsx").contains("cell cap"))
    assert(bad("wrongsheet.xlsx").contains("no sheet"))
    // data columns of quarantine rows are null — in-band but inert
    assert(got.filter(col("error").isNotNull && col("region").isNotNull).count() == 0)
    // the file universe is conserved: every .xlsx appears exactly once
    // as either data rows or one error row
    assert(got.select("src_file").distinct().count() == 6L)
  }

  test("cumulative zip budgets: many-part bombs and entry floods throw (and quarantine)") {
    // r11 advice: the per-part cap alone admits a workbook with many
    // entries each just UNDER maxPartBytes. Whole-workbook budget =
    // 4 x maxPartBytes; entry cap fixed at 4096.
    def zipOf(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new ZipOutputStream(bos)
      try entries.foreach { case (n, c) =>
        out.putNextEntry(new ZipEntry(n)); out.write(c); out.closeEntry()
      } finally out.close()
      bos.toByteArray
    }
    // 10 parts x 600 bytes: every part under the 1024-byte part cap,
    // total 6000 > the 4096-byte whole-workbook budget
    val multi = zipOf((1 to 10).map(i =>
      s"part$i.xml" -> Array.fill[Byte](600)('x')))
    val e1 = intercept[IllegalArgumentException] {
      Xlsx.readGridBytes(multi, "W", "multi.xlsx",
        maxCells = 1000L, maxPartBytes = 1024L)
    }
    assert(e1.getMessage.contains("whole-workbook budget"))
    // 5000 near-empty entries blow the fixed 4096-entry cap
    val flood = zipOf((1 to 5000).map(i => s"e$i" -> Array[Byte]('x')))
    val e2 = intercept[IllegalArgumentException] {
      Xlsx.readGridBytes(flood, "W", "flood.xlsx",
        maxCells = 1000L, maxPartBytes = 1024L)
    }
    assert(e2.getMessage.contains("zip entries"))
    // both throws land in the quarantine path as in-band error rows
    val dir = java.nio.file.Files.createTempDirectory("xlsx_budget").toFile
    dir.deleteOnExit()
    java.nio.file.Files.write(new java.io.File(dir, "multi.xlsx").toPath, multi)
    java.nio.file.Files.write(new java.io.File(dir, "flood.xlsx").toPath, flood)
    val got = Xlsx.readSheetDirQuarantined(
      spark, dir.getAbsolutePath, "Alignments", Seq("region"),
      maxCells = 1000L, maxPartBytes = 1024L)
    val bad = got.filter(col("error").isNotNull)
      .select("src_file", "error").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(bad.keySet == Set("multi.xlsx", "flood.xlsx"))
    assert(bad("multi.xlsx").contains("whole-workbook budget"))
    assert(bad("flood.xlsx").contains("zip entries"))
  }

  test("readSheetDir: distributed many-workbook read equals the per-file union") {
    val dir = "/root/repo/data/alignments_books"
    val cols = Seq("region", "district", "unit", "location_name")
    val dist = Xlsx.readSheetDir(spark, dir, "Alignments", cols)
    // the single-file driver path, unioned by hand, projected to the
    // same declared columns by header name
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".xlsx"))
      .sortBy(_.getName)
    assert(files.length == 20)
    val manual = files.toSeq.flatMap { f =>
      val grid = Xlsx.readGrid(f.getPath, "Alignments")
      val header = grid.head.zipWithIndex.map { case (h, i) => h.getOrElse(s"_c$i") }
      val idx = cols.map(header.indexOf)
      grid.tail.map(r => idx.map(i => if (i < 0) null else r.lift(i).flatten.orNull))
    }
    val got = dist.collect().map(r => cols.indices.map(r.getString).toSeq)
    assert(got.length == manual.length && got.sortBy(_.toString).toSeq ==
      manual.map(_.toSeq).sortBy(_.toString),
      s"distributed ${got.length} rows != manual ${manual.length}")
    // header-name mapping proof: the shuffled-order books (14-17)
    // still land region in the region column; book 19 (no district
    // header) yields nulls there and nowhere else
    assert(got.forall(r => r.head == null || r.head.startsWith("R")))
    val nulls = dist.filter(col("district").isNull).count()
    assert(nulls > 0 && nulls == manual.count(_(1) == null))
    // provenance arm: src_file names each row's workbook
    val withF = Xlsx.readSheetDir(spark, dir, "Alignments", cols, withFile = true)
    val perFile = withF.groupBy("src_file").count().collect()
    assert(perFile.length == 20 && perFile.map(_.getLong(1)).sum == manual.length)
  }

  test("AlignmentsFile: the xlsx workbook and its CSV export clean to the SAME frame") {
    // missing-value encodings align: an empty workbook CELL and an
    // empty CSV field both read as NULL, so the two formats clean
    // identically — 40 raw rows, 6 lacking a key column drop
    val fromXlsx = AlignmentsFile
      .readCleaned(spark, "/root/repo/data/alignments_sample.xlsx")
    val fromCsv = AlignmentsFile
      .readCleaned(spark, "/root/repo/data/alignments_sample.csv")
    assert(fromXlsx.schema == fromCsv.schema)
    assert(AlignmentsFile
      .read(spark, "/root/repo/data/alignments_sample.xlsx").count() == 40)
    assert(fromXlsx.count() == 34)
    assert(fromXlsx.exceptAll(fromCsv).isEmpty && fromCsv.exceptAll(fromXlsx).isEmpty)
  }
}
