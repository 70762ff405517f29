package graft.sinks

/** Dependency-free figure sinks: the reference saves matplotlib PNGs per
  * model script (PR curves `OOF_AUC_test.py:340-362`, top-20 coefficient
  * bars `LR_Advanced.py:590-597`). No raster libs ship in this environment,
  * so the engine emits the same figures as SVG — a pure string format every
  * browser/report tool renders, and (unlike PNG) byte-deterministic, so the
  * artifacts diff cleanly across runs.
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

  def save(svg: String, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), svg)
}
