package graft

import java.nio.file.Files
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._
import javax.xml.parsers.DocumentBuilderFactory
import graft.sinks.{Figures, Xlsx}

/** Dependency-free artifact sinks: xlsx (zip-of-XML round-trip via the JDK)
  * and SVG figures (well-formed XML, deterministic bytes). */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(suffix: String): String =
    Files.createTempFile("graft-sink", suffix).toString

  private lazy val df = Seq(
    (1L, "alpha", 0.5, true),
    (2L, "es<ca&pe>", -2.0, false),
    (3L, null.asInstanceOf[String], 12.25, true)
  ).toDF("id", "name", "score", "flag")

  test("xlsx: valid zip parts, typed cells, XML escaping, null = blank") {
    val path = tmp(".xlsx")
    Xlsx.write(df.orderBy("id"), path, sheet = "features")
    val zf = new ZipFile(path)
    val names = zf.entries().asScala.map(_.getName).toSet
    assert(names == Set("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
      "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml"))
    val sheetXml = new String(
      zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes(), "UTF-8")
    zf.close()
    // parses as XML (DocumentBuilder rejects malformed escaping)
    val doc = DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(sheetXml.getBytes("UTF-8")))
    val rows = doc.getElementsByTagName("row")
    assert(rows.getLength == 4) // header + 3 data rows
    val cells = doc.getElementsByTagName("c")
    // row 3 (id=2): string cell carries the escaped original text
    assert(sheetXml.contains("es&lt;ca&amp;pe&gt;"))
    // numeric cells are t="n", booleans t="b"
    val types = (0 until cells.getLength).map(i =>
      Option(cells.item(i).getAttributes.getNamedItem("t")).map(_.getNodeValue).getOrElse(""))
    assert(types.count(_ == "n") == 6) // 3 ids + 3 scores
    assert(types.count(_ == "b") == 3)
    // null string -> no cell emitted for that ref (blank)
    assert(!sheetXml.contains("B4\" t=\"inlineStr\""))
  }

  test("png figure twins: decodable, right dims, deterministic bytes, curve pixels drawn") {
    val pr = Seq((0.0, 1.0), (0.5, 0.8), (1.0, 0.6))
    val png = Figures.prCurvePng(pr)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 480 && img.getHeight == 360)
    // curve color appears somewhere inside the plot box
    var found = false
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      if ((img.getRGB(x, y) & 0xffffff) == 0x1f77b4) found = true
    assert(found, "polyline pixels missing")
    assert(png.toSeq == Figures.prCurvePng(pr).toSeq) // byte-deterministic
    val bars = Figures.importanceBarPng(Seq("a" -> 0.9, "b" -> -0.4, "c" -> 0.1))
    val bimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bars))
    var (pos, neg) = (0, 0)
    for (y <- 0 until bimg.getHeight; x <- 0 until bimg.getWidth) {
      val c = bimg.getRGB(x, y) & 0xffffff
      if (c == 0x1f77b4) pos += 1
      if (c == 0xd62728) neg += 1
    }
    assert(pos > 0 && neg > 0, s"bar fills missing: pos=$pos neg=$neg")
  }

  test("xlsx: non-finite doubles emit blank cells, not invalid numeric XML") {
    // degenerate-fold metrics can legitimately be NaN; <v>NaN</v> with t="n"
    // is invalid SpreadsheetML that Excel rejects or "repairs"
    val path = tmp(".xlsx")
    val weird = Seq((1L, Double.NaN, 2.5), (2L, Double.PositiveInfinity, Double.NegativeInfinity))
      .toDF("id", "a", "b")
    Xlsx.write(weird.orderBy("id"), path)
    val zf = new ZipFile(path)
    val sheetXml = new String(
      zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes(), "UTF-8")
    zf.close()
    assert(!sheetXml.contains("NaN") && !sheetXml.contains("Infinity"))
    assert(sheetXml.contains("<v>2.5</v>")) // finite neighbors untouched
  }

  test("xlsx: deterministic bytes across re-exports; maxRows guard fails fast") {
    val a = tmp(".xlsx")
    val b = tmp(".xlsx")
    Xlsx.write(df.orderBy("id"), a)
    Xlsx.write(df.orderBy("id"), b)
    assert(Files.readAllBytes(java.nio.file.Paths.get(a))
      .sameElements(Files.readAllBytes(java.nio.file.Paths.get(b))))
    val e = intercept[IllegalArgumentException] {
      Xlsx.write(df, tmp(".xlsx"), maxRows = 2)
    }
    assert(e.getMessage.contains("driver-side artifact"))
  }

  test("dual xlsx+csv sink: csv half readable back with identical values") {
    val dir = Files.createTempDirectory("graft-dual").toString
    Xlsx.writeWithCsv(df.orderBy("id"), dir, "entity_features")
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/entity_features.xlsx")))
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/entity_features.csv")
    assert(back.count() == 3)
    assert(back.columns.toSeq == df.columns.toSeq)
  }

  test("svg figures: well-formed XML, all points/bars present, deterministic") {
    val pr = (0 to 10).map(i => (i / 10.0, 1.0 - i / 20.0))
    val svg = Figures.prCurveSvg(pr)
    val doc = DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(svg.getBytes("UTF-8")))
    assert(doc.getDocumentElement.getTagName == "svg")
    val poly = doc.getElementsByTagName("polyline").item(0)
    assert(poly.getAttributes.getNamedItem("points").getNodeValue.split(" ").length == 11)
    assert(svg == Figures.prCurveSvg(pr)) // deterministic

    val bars = Figures.importanceBarSvg(Seq("b" -> -0.9, "a" -> 0.5, "c&d" -> 0.1))
    val bdoc = DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(bars.getBytes("UTF-8")))
    assert(bdoc.getElementsByTagName("rect").getLength == 3)
    assert(bars.contains("c&amp;d"))
    // signed bars: negative red, positive blue
    assert(bars.contains("#d62728") && bars.contains("#1f77b4"))
  }

  test("end-to-end artifact chain: importance query -> svg + xlsx") {
    val fi = SparkEntry.queries("q_feature_importance")(spark, "/root/testdata/sf0.001")
    val rows = fi.orderBy("rank").collect()
    assert(rows.length == 3)
    val svg = Figures.importanceBarSvg(
      rows.map(r => r.getString(0) -> r.getDouble(1)).toSeq,
      title = "Top LR coefficients")
    assert(svg.contains("view_count") || svg.contains("click_count") || svg.contains("signup_count"))
    val path = tmp(".xlsx")
    Xlsx.write(fi.orderBy("rank"), path)
    assert(Files.size(java.nio.file.Paths.get(path)) > 500)
  }

  test("EvalMain writes the full artifact set (metrics json + xlsx/csv/svg)") {
    val out = Files.createTempDirectory("graft-eval").toString
    EvalMain.run(spark, out, "/root/testdata/sf0.001", k = 2)
    val metrics = Files.readString(java.nio.file.Paths.get(s"$out/eval_metrics.json"))
    Seq("folds", "summary", "accuracy", "aucPr").foreach(k => assert(metrics.contains(k)))
    Seq("feature_importance.xlsx", "feature_importance.svg", "pr_curve.svg")
      .foreach(f => assert(Files.exists(java.nio.file.Paths.get(s"$out/$f")), f))
    // both svgs parse as XML
    Seq("feature_importance.svg", "pr_curve.svg").foreach { f =>
      DocumentBuilderFactory.newInstance().newDocumentBuilder()
        .parse(new java.io.File(s"$out/$f"))
    }
  }

  test("column letters: A..Z, AA wraparound") {
    assert(Xlsx.colLetters(0) == "A" && Xlsx.colLetters(25) == "Z")
    assert(Xlsx.colLetters(26) == "AA" && Xlsx.colLetters(27) == "AB")
    assert(Xlsx.colLetters(701) == "ZZ" && Xlsx.colLetters(702) == "AAA")
  }
}
