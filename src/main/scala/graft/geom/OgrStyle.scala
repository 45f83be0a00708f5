package graft.geom

/** OGR feature-style string parser — the OGR_STYLE mini-language
  * (PEN/BRUSH/SYMBOL/LABEL tool strings) of
  * /root/reference/ogr/ogrfeaturestyle.cpp:
  *
  *  - a style is `TOOL(k:v,k:v,…)[;TOOL(…)]…`; the ';' and ',' separators
  *    respect double-quoted values (OGRStyleMgr::GetPartCount /
  *    CSLTokenizeString2 CSLT_HONOURSTRINGS)
  *  - params split on the first ':' outside quotes; quotes are stripped
  *    from values (Parse, :1715-1845)
  *  - "georeferenced" numeric params (the bGeoref entries of asStylePen/
  *    Brush/Symbol/Label, e.g. pen `w`, symbol `s`, label `dx`) may carry
  *    a unit suffix g|px|pt|mm|cm|in (SetInternalInputUnitFromParam,
  *    :1866-1914; default mm) which is stripped and the value converted
  *    into the tool's output unit — mm by default — at parse time
  *    (ComputeWithUnit, :1920-1976; the test_ogr.cpp:531 pen case)
  *  - value-less params store "1" (legacy boolean behavior, :1840)
  *  - colors are `#RRGGBB[AA]` (GetRGBFromString, :1524; alpha 255 when
  *    absent)
  */
object OgrStyle {

  final case class Part(tool: String, params: Vector[(String, Double, String)])
  // params: (key, valueMmIfGeoref, rawString). For georef numeric params
  // the double is the value converted to mm; for others it is NaN.

  private val georef: Map[String, Set[String]] = Map(
    "PEN" -> Set("w", "dp"),
    "BRUSH" -> Set("s", "dx", "dy"),
    "SYMBOL" -> Set("s", "dx", "dy", "ds", "dp", "di"),
    "LABEL" -> Set("s", "dx", "dy", "dp"))

  /** meters-per-input-unit factors (ComputeWithUnit input switch); ground
    * uses scale 1 (the SetUnit default). */
  private def toMeters(unit: String): Double = unit match {
    case "g" => 1.0
    case "px" | "pt" => 1.0 / (72.0 * 39.37)
    case "mm" => 0.001
    case "cm" => 0.01
    case "in" => 1.0 / 39.37
    case _ => 0.001
  }

  /** output-unit factors (ComputeWithUnit output switch). */
  private def fromMeters(unit: String): Double = unit match {
    case "g" => 1.0
    case "px" | "pt" => 72.0 * 39.37
    case "mm" => 1000.0
    case "cm" => 100.0
    case "in" => 39.37
    case _ => 1000.0
  }

  /** split on `sep` outside double quotes. */
  private def splitTop(s: String, sep: Char): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    s.foreach { c =>
      if (c == '"') { inQ = !inQ; cur += c }
      else if (c == sep && !inQ) { out += cur.result(); cur.clear() }
      else cur += c
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** strstr-order unit detection (SetInternalInputUnitFromParam tries g,
    * px, pt, mm, cm, in and truncates at the FIRST match). Returns
    * (numericPart, unit). */
  private def stripUnit(v: String): (String, String) = {
    for (u <- Seq("g", "px", "pt", "mm", "cm", "in")) {
      val i = v.indexOf(u)
      if (i >= 0) return (v.substring(0, i), u)
    }
    (v, "mm")
  }

  private def unquote(v: String): String =
    if (v.length >= 2 && v.head == '"' && v.last == '"') v.substring(1, v.length - 1)
    else v

  def parse(style: String): Vector[Part] =
    splitTop(style, ';').flatMap { partStr =>
      val open = partStr.indexOf('(')
      if (open < 0 || !partStr.endsWith(")")) None
      else {
        val tool = partStr.substring(0, open).trim.toUpperCase
        val content = partStr.substring(open + 1, partStr.length - 1)
        val geo = georef.getOrElse(tool, Set.empty)
        val params = splitTop(content, ',').flatMap { kv =>
          // split on the first ':' outside quotes
          var inQ = false; var cut = -1
          var i = 0
          while (i < kv.length && cut < 0) {
            if (kv(i) == '"') inQ = !inQ
            else if (kv(i) == ':' && !inQ) cut = i
            i += 1
          }
          val (k, raw) =
            if (cut < 0) (kv.trim, "1") // value-less boolean param
            else (kv.substring(0, cut).trim, kv.substring(cut + 1).trim)
          if (k.isEmpty) None
          else if (geo.contains(k.toLowerCase)) {
            val (num, unit) = stripUnit(unquote(raw))
            val d = try num.toDouble catch { case _: NumberFormatException => Double.NaN }
            // convert input unit -> meters -> mm (the default tool unit)
            Some((k.toLowerCase, d * toMeters(unit) * 1000.0, num))
          } else Some((k.toLowerCase, Double.NaN, unquote(raw)))
        }
        Some(Part(tool, params))
      }
    }

  def partCount(style: String): Int = parse(style).length

  def toolName(style: String, i: Int): String = {
    val ps = parse(style)
    if (i >= 0 && i < ps.length) ps(i).tool else null
  }

  /** raw param string (unit-stripped for georef params, unquoted). */
  def param(style: String, i: Int, key: String): String = {
    val ps = parse(style)
    if (i < 0 || i >= ps.length) return null
    ps(i).params.find(_._1.equalsIgnoreCase(key)).map(_._3).orNull
  }

  /** georef param converted to `outUnit` (GetParamDbl after SetUnit). */
  def paramDbl(style: String, i: Int, key: String, outUnit: String): java.lang.Double = {
    val ps = parse(style)
    if (i < 0 || i >= ps.length) return null
    ps(i).params.find(_._1.equalsIgnoreCase(key)) match {
      case Some((_, mm, _)) if !mm.isNaN =>
        java.lang.Double.valueOf(mm / 1000.0 * fromMeters(outUnit))
      case Some((_, _, raw)) =>
        try java.lang.Double.valueOf(raw.toDouble)
        catch { case _: NumberFormatException => null }
      case None => null
    }
  }

  /** OGRStyleTable (ogrfeaturestyle.cpp:790-1050): named style strings
    * stored as "name:style" lines (AddStyle :874, SaveStyleTable writes
    * one entry per line); lookups are case-insensitive on the name
    * (IsExist/EQUALN); AddStyle refuses duplicates, ModifyStyle upserts.
    * Feature styles beginning with '@' are table references
    * (OGRStyleMgr::InitStyleString name lookup). */
  final case class StyleTable(entries: Vector[(String, String)]) {
    def find(name: String): Option[String] =
      entries.find(_._1.equalsIgnoreCase(name)).map(_._2)
    def add(name: String, style: String): Option[StyleTable] =
      if (find(name).isDefined) None
      else Some(StyleTable(entries :+ (name, style)))
    def remove(name: String): StyleTable =
      StyleTable(entries.filterNot(_._1.equalsIgnoreCase(name)))
    def modify(name: String, style: String): StyleTable =
      StyleTable(remove(name).entries :+ (name, style))
    def serialize: String = entries.map { case (n, s) => s"$n:$s" }.mkString("\n")
  }

  object StyleTable {
    val empty: StyleTable = StyleTable(Vector.empty)
    /** inverse of serialize: one "name:style" entry per line (the split is
      * on the FIRST ':' — style strings themselves contain ':'). */
    def parse(text: String): StyleTable =
      StyleTable(text.split('\n').toVector.map(_.trim).filter(_.nonEmpty).flatMap { line =>
        val cut = line.indexOf(':')
        if (cut <= 0) None else Some((line.substring(0, cut), line.substring(cut + 1)))
      })
  }

  /** Resolve a feature style through a table: "@name" is a table lookup
    * (null when missing, like OGRStyleMgr returning FALSE), anything else
    * passes through. */
  def resolveStyle(style: String, table: StyleTable): String =
    if (style != null && style.startsWith("@")) table.find(style.substring(1)).orNull
    else style

  /** #RRGGBB[AA] → "r,g,b,a" (GetRGBFromString; alpha defaults to 255);
    * null when unparseable. */
  def rgba(color: String): String = {
    if (color == null || !color.startsWith("#")) return null
    val hex = color.substring(1)
    if (hex.length != 6 && hex.length != 8) return null
    try {
      val r = Integer.parseInt(hex.substring(0, 2), 16)
      val g = Integer.parseInt(hex.substring(2, 4), 16)
      val b = Integer.parseInt(hex.substring(4, 6), 16)
      val a = if (hex.length == 8) Integer.parseInt(hex.substring(6, 8), 16) else 255
      s"$r,$g,$b,$a"
    } catch { case _: NumberFormatException => null }
  }
}
