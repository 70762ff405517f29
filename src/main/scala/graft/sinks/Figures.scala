package graft.sinks

/** Dependency-free figure sinks: the reference saves matplotlib PNGs per
  * model script (PR curves `OOF_AUC_test.py:340-362`, top-20 coefficient
  * bars `LR_Advanced.py:590-597`). The engine emits BOTH faces with zero
  * added dependencies: SVG (pure string, diff-friendly) and literal PNG
  * twins rasterized pixel-by-pixel (Bresenham — no Graphics2D antialiasing
  * variance) and encoded by the JDK's `javax.imageio` PNG writer.
  *
  * Inputs are pre-aggregated TINY tables (a PR curve has |distinct scores|
  * points, an importance chart top-k bars) — figure rendering is a
  * driver-side artifact step in the reference too.
  */
object Figures {

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  private def fmt(d: Double): String = f"$d%.2f"

  /** Precision-recall curve: `points` as (recall, precision) in [0,1]. */
  def prCurveSvg(points: Seq[(Double, Double)], width: Int = 480, height: Int = 360,
                 title: String = "Precision-Recall curve"): String = {
    val (mL, mR, mT, mB) = (46, 12, 28, 34)
    val (pw, ph) = (width - mL - mR, height - mT - mB)
    def x(r: Double) = mL + r * pw
    def y(p: Double) = mT + (1.0 - p) * ph
    val path = points.sortBy(_._1)
      .map { case (r, p) => s"${fmt(x(r))},${fmt(y(p))}" }.mkString(" ")
    val gridLines = (0 to 4).map { i =>
      val t = i / 4.0
      s"""<line x1="${fmt(x(0))}" y1="${fmt(y(t))}" x2="${fmt(x(1))}" y2="${fmt(y(t))}" stroke="#ddd"/>""" +
        s"""<text x="${mL - 6}" y="${fmt(y(t) + 4)}" text-anchor="end" font-size="10">${fmt(t)}</text>""" +
        s"""<text x="${fmt(x(t))}" y="${height - mB + 14}" text-anchor="middle" font-size="10">${fmt(t)}</text>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8"?>""" +
      s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height">""" +
      s"""<text x="${width / 2}" y="16" text-anchor="middle" font-size="12">${esc(title)}</text>""" +
      gridLines +
      s"""<rect x="$mL" y="$mT" width="$pw" height="$ph" fill="none" stroke="#888"/>""" +
      s"""<polyline points="$path" fill="none" stroke="#1f77b4" stroke-width="1.5"/>""" +
      s"""<text x="${width / 2}" y="${height - 6}" text-anchor="middle" font-size="11">recall</text>""" +
      s"""<text x="12" y="${height / 2}" text-anchor="middle" font-size="11" transform="rotate(-90 12 ${height / 2})">precision</text>""" +
      "</svg>"
  }

  /** Horizontal signed bar chart of (name, value) — the top-k coefficient
    * figure. Bars extend left (negative, red) or right (positive, blue) of
    * a zero axis placed by the value range. */
  def importanceBarSvg(items: Seq[(String, Double)], width: Int = 520,
                       title: String = "Top feature importance"): String = {
    require(items.nonEmpty, "importanceBarSvg: no items")
    val barH = 18
    val gap = 6
    val (mL, mR, mT, mB) = (140, 16, 28, 10)
    val height = mT + mB + items.size * (barH + gap)
    val maxAbs = math.max(items.map(v => math.abs(v._2)).max, 1e-12)
    val pw = width - mL - mR
    val zeroX = mL + pw / 2.0
    def len(v: Double) = math.abs(v) / maxAbs * (pw / 2.0)
    val bars = items.zipWithIndex.map { case ((name, v), i) =>
      val yTop = mT + i * (barH + gap)
      val (bx, bw) = if (v >= 0) (zeroX, len(v)) else (zeroX - len(v), len(v))
      val color = if (v >= 0) "#1f77b4" else "#d62728"
      s"""<text x="${mL - 6}" y="${yTop + barH - 5}" text-anchor="end" font-size="11">${esc(name)}</text>""" +
        s"""<rect x="${fmt(bx)}" y="$yTop" width="${fmt(math.max(bw, 0.5))}" height="$barH" fill="$color"/>""" +
        s"""<text x="${fmt(if (v >= 0) bx + bw + 4 else bx - 4)}" y="${yTop + barH - 5}" """ +
        s"""text-anchor="${if (v >= 0) "start" else "end"}" font-size="10">${fmt(v)}</text>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8"?>""" +
      s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height">""" +
      s"""<text x="${width / 2}" y="16" text-anchor="middle" font-size="12">${esc(title)}</text>""" +
      s"""<line x1="${fmt(zeroX)}" y1="$mT" x2="${fmt(zeroX)}" y2="${height - mB}" stroke="#888"/>""" +
      bars + "</svg>"
  }

  // ——— PNG raster twins (the reference's literal artifact format,
  //     `LR_Advanced.py:590-597`): pixels drawn directly into a
  //     BufferedImage (integer Bresenham lines + rect fills — no Graphics2D
  //     antialiasing, whose output varies across JDK rendering pipelines),
  //     encoded by the JDK PNG writer. Same-pixels → same-bytes, so these
  //     artifacts diff cleanly across runs like the SVG twins. ———

  private def blank(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, 0xffffff); x += 1 }; y += 1 }
    img
  }

  private def put(img: java.awt.image.BufferedImage, x: Int, y: Int, rgb: Int): Unit =
    if (x >= 0 && y >= 0 && x < img.getWidth && y < img.getHeight) img.setRGB(x, y, rgb)

  /** Integer Bresenham — deterministic by construction. */
  private def line(img: java.awt.image.BufferedImage,
                   x0: Int, y0: Int, x1: Int, y1: Int, rgb: Int): Unit = {
    var (x, y) = (x0, y0)
    val dx = math.abs(x1 - x0); val sx = if (x0 < x1) 1 else -1
    val dy = -math.abs(y1 - y0); val sy = if (y0 < y1) 1 else -1
    var err = dx + dy
    var done = false
    while (!done) {
      put(img, x, y, rgb)
      if (x == x1 && y == y1) done = true
      else {
        val e2 = 2 * err
        if (e2 >= dy) { err += dy; x += sx }
        if (e2 <= dx) { err += dx; y += sy }
      }
    }
  }

  private def fillRect(img: java.awt.image.BufferedImage,
                       x0: Int, y0: Int, w: Int, h: Int, rgb: Int): Unit = {
    var y = y0
    while (y < y0 + h) { var x = x0; while (x < x0 + w) { put(img, x, y, rgb); x += 1 }; y += 1 }
  }

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** PR curve as PNG bytes: axes box, 5 gridlines, polyline. */
  def prCurvePng(points: Seq[(Double, Double)], width: Int = 480,
                 height: Int = 360): Array[Byte] = {
    val (mL, mR, mT, mB) = (46, 12, 28, 34)
    val (pw, ph) = (width - mL - mR, height - mT - mB)
    def px(r: Double) = mL + math.round(r * pw).toInt
    def py(p: Double) = mT + math.round((1.0 - p) * ph).toInt
    val img = blank(width, height)
    (0 to 4).foreach { i =>
      val t = i / 4.0
      line(img, px(0), py(t), px(1), py(t), 0xdddddd)
    }
    line(img, mL, mT, mL + pw, mT, 0x888888)
    line(img, mL, mT + ph, mL + pw, mT + ph, 0x888888)
    line(img, mL, mT, mL, mT + ph, 0x888888)
    line(img, mL + pw, mT, mL + pw, mT + ph, 0x888888)
    val pts = points.sortBy(_._1).map { case (r, p) => (px(r), py(p)) }
    pts.sliding(2).foreach {
      case Seq((x0, y0), (x1, y1)) => line(img, x0, y0, x1, y1, 0x1f77b4)
      case _ =>
    }
    encodePng(img)
  }

  /** Signed horizontal bar chart as PNG bytes (top-k coefficient figure):
    * bars left (negative, red) / right (positive, blue) of a zero axis. */
  def importanceBarPng(items: Seq[(String, Double)], width: Int = 520): Array[Byte] = {
    require(items.nonEmpty, "importanceBarPng: no items")
    val barH = 18; val gap = 6; val mT = 28; val mB = 10; val mX = 14
    val height = mT + items.size * (barH + gap) + mB
    val pw = width - 2 * mX
    val maxAbs = math.max(items.map(v => math.abs(v._2)).max, 1e-12)
    val zeroX = mX + pw / 2
    val img = blank(width, height)
    line(img, zeroX, mT - 4, zeroX, height - mB, 0x888888)
    items.zipWithIndex.foreach { case ((_, v), i) =>
      val len = math.max(1, math.round(math.abs(v) / maxAbs * (pw / 2.0)).toInt)
      val y = mT + i * (barH + gap)
      if (v < 0) fillRect(img, zeroX - len, y, len, barH, 0xd62728)
      else fillRect(img, zeroX, y, len, barH, 0x1f77b4)
    }
    encodePng(img)
  }

  def savePng(bytes: Array[Byte], path: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)

  def save(svg: String, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), svg)
}
