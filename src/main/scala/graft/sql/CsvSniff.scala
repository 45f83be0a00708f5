package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** OGR CSV field-type autodetection — the AUTODETECT_TYPE=YES algorithm of
  * the reference CSV driver (/root/reference/ogr/ogrsf_frmts/csv/
  * ogrcsvlayer.cpp:881-1215 AutodetectFieldTypes), completing the CSV
  * source story: `spark.read.csv` tokenizes, this sniffs OGR types.
  *
  * Per-value classification (reference order):
  *  1. empty token → skipped entirely (":984 continue");
  *  2. CPLGetValueType (port of /root/reference/port/cpl_string.cpp:2937):
  *     integer/real grammar with the leading-zero rule ("0123" → STRING),
  *     single dot, single exponent with mandatory mantissa, embedded
  *     whitespace → STRING; an exponent longer than 3 digits that
  *     evaluates to infinity → STRING (":3031-3037");
  *  3. INTEGER splits Integer / Integer64 on int32 fit (":1020-1026");
  *     "inf"/"-inf"/"nan" (case-insensitive) → Real (":1028-1034");
  *  4. otherwise OGRParseDate (subset: Y-M-D or Y/M/D dates, HH:MM[:SS[.f]]
  *     times, both joined by ' ' or 'T' with optional Z/±HH[:MM] zone) →
  *     Date / Time / DateTime via the has-'/'-or-'-' / has-':' checks
  *     (":1042-1056"); else String, with t/true/y/yes/on //
  *     f/false/n/no/off tracked as boolean words (":858-876").
  *
  * Sequential merge rules ported branch-for-branch (":1086-1152"),
  * INCLUDING the order-dependent corners: a field whose FIRST value is a
  * boolean word keeps its boolean flag through later NUMERIC values
  * ("t","5" → Integer(Boolean)) while the reverse order finalizes String
  * ("5","t" → String), and a finalized-String field stops updating
  * (":988 continue").
  *
  * Distribution: the per-field state machine has ≤ 32 states
  * (type × boolFlag × finalString), so each partition reduces its values
  * to one TRANSITION TABLE (state → state, 32 bytes per column) — an
  * associative composition — and the driver composes the tables in
  * range-partition order. Order-faithful sequential semantics at any
  * parallelism; driver state = #partitions × #columns × 32 bytes. */
object CsvSniff {

  // type codes
  private final val UNSET = 0
  private final val INT = 1
  private final val INT64 = 2
  private final val REAL = 3
  private final val DATE = 4
  private final val DATETIME = 5
  private final val TIME = 6
  private final val STR = 7

  // value classes (EMPTY handled before stepping)
  final val CEmpty = 0
  final val CInt = 1
  final val CInt64 = 2
  final val CReal = 3
  final val CDate = 4
  final val CDateTime = 5
  final val CTime = 6
  final val CBool = 7
  final val CStr = 8

  @inline private def enc(t: Int, b: Boolean, f: Boolean): Int =
    t * 4 + (if (b) 2 else 0) + (if (f) 1 else 0)

  /** One reference-loop iteration for a non-empty value of class `cls`. */
  def step(state: Int, cls: Int): Int = {
    if (cls == CEmpty) return state
    val t = state / 4; val b = (state & 2) != 0; val f = (state & 1) != 0
    if (f) return state // ":988 abFinalTypeStringSet → continue"
    if (t == UNSET) {
      // first value sets the field (":1086-1094")
      cls match {
        case CInt => enc(INT, b = false, f = false)
        case CInt64 => enc(INT64, b = false, f = false)
        case CReal => enc(REAL, b = false, f = false)
        case CDate => enc(DATE, b = false, f = false)
        case CDateTime => enc(DATETIME, b = false, f = false)
        case CTime => enc(TIME, b = false, f = false)
        case CBool => enc(STR, b = true, f = false)
        case _ => enc(STR, b = false, f = true) // String && !boolean → final
      }
    } else if (t == STR) {
      // the ":1028 abFieldSet && OFTString" branch is only reached for
      // non-numeric values; numerics fall into the merge chain, which has
      // NO String case — state (and the boolean flag) survive untouched
      if (cls == CInt || cls == CInt64 || cls == CReal) state
      else enc(STR, b && cls == CBool, f = true)
    } else {
      val vt = cls match {
        case CInt => INT
        case CInt64 => INT64
        case CReal => REAL
        case CDate => DATE
        case CDateTime => DATETIME
        case CTime => TIME
        case _ => STR // CBool and CStr both surface as OFTString here
      }
      if (vt == t) state
      else {
        val merged = (t, vt) match {
          case (INT, INT64) | (INT, REAL) => vt
          case (INT64, INT) => INT64
          case (INT64, REAL) => REAL
          case (REAL, INT) | (REAL, INT64) => REAL
          case (DATE, DATETIME) => DATETIME
          case (DATETIME, DATE) => DATETIME
          case _ => -1 // SetFinalStringType
        }
        if (merged >= 0) enc(merged, b, f = false)
        else enc(STR, b, f = true)
      }
    }
  }

  def typeName(state: Int): String = {
    val t = state / 4; val b = (state & 2) != 0
    t match {
      case INT => "Integer"
      case INT64 => "Integer64"
      case REAL => "Real"
      case DATETIME => "DateTime"
      case DATE => "Date"
      case TIME => "Time"
      case _ => if (b) "Integer(Boolean)" else "String" // UNSET and STR
    }
  }

  // -------------------------------------------------------- classification

  private val TrueWords = Set("t", "true", "y", "yes", "on")
  private val FalseWords = Set("f", "false", "n", "no", "off")

  /** Port of CPLGetValueType: 0 = STRING, 1 = INTEGER, 2 = REAL. */
  def cplValueType(v0: String): Int = {
    var i = 0; val n = v0.length
    while (i < n && v0.charAt(i).isWhitespace) i += 1
    if (i >= n) return 0
    if (v0.charAt(i) == '+' || v0.charAt(i) == '-') i += 1
    // leading-zero rule: "0123" is a string, "0" and "0.x" are not
    if (i < n && v0.charAt(i) == '0' && i + 1 < n && v0.charAt(i + 1) != '.')
      return 0
    var foundDot = false; var foundExp = false; var lastCharExp = false
    var isReal = false; var foundMantissa = false
    var afterExp = -1
    while (i < n) {
      val c = v0.charAt(i)
      if (c.isDigit) { lastCharExp = false; foundMantissa = true }
      else if (c.isWhitespace) {
        var j = i
        while (j < n && v0.charAt(j).isWhitespace) j += 1
        if (j == n) i = n - 1 else return 0
      } else if (c == '-' || c == '+') {
        if (!lastCharExp) return 0
        lastCharExp = false
      } else if (c == '.') {
        isReal = true
        if (!foundDot && !lastCharExp) foundDot = true else return 0
        lastCharExp = false
      } else if (c == 'D' || c == 'd' || c == 'E' || c == 'e') {
        if (!foundMantissa) return 0
        if (i + 1 >= n || !(v0.charAt(i + 1) == '+' || v0.charAt(i + 1) == '-' ||
          v0.charAt(i + 1).isDigit)) return 0
        isReal = true
        if (!foundExp) foundExp = true else return 0
        afterExp = i + 1
        lastCharExp = true
      } else return 0
      i += 1
    }
    if (isReal && afterExp >= 0 && n - afterExp > 3) {
      val d = try java.lang.Double.parseDouble(
        v0.trim.replace('D', 'E').replace('d', 'e')) catch { case _: Exception => 0.0 }
      if (d.isInfinite) return 0
    }
    if (isReal) 2 else 1
  }

  private val DateRe = "^(\\d{4})[-/](\\d{1,2})[-/](\\d{1,2})$".r
  private val TimeRe = "^(\\d{1,2}):(\\d{1,2})(?::(\\d{1,2})(?:\\.\\d+)?)?$".r
  private val DateTimeRe =
    ("^(\\d{4})[-/](\\d{1,2})[-/](\\d{1,2})[ T]" +
      "(\\d{1,2}):(\\d{1,2})(?::(\\d{1,2})(?:\\.\\d+)?)?" +
      "(?:Z|[+-]\\d{1,2}(?::?\\d{2})?)?$").r

  /** OGRParseDate subset (ogr/ogrutils.cpp) with field-range validation. */
  def parsesAsDate(v: String): Boolean = {
    val t = v.trim
    t match {
      case DateRe(_, m, d) => m.toInt >= 1 && m.toInt <= 12 && d.toInt >= 1 && d.toInt <= 31
      case TimeRe(h, mi, s) =>
        h.toInt < 24 && mi.toInt < 60 && (s == null || s.toInt < 61)
      case DateTimeRe(_, m, d, h, mi, s) =>
        m.toInt >= 1 && m.toInt <= 12 && d.toInt >= 1 && d.toInt <= 31 &&
          h.toInt < 24 && mi.toInt < 60 && (s == null || s.toInt < 61)
      case _ => false
    }
  }

  /** Value class per the reference loop's classification order. */
  def classify(v: String): Int = {
    if (v == null || v.isEmpty) return CEmpty
    cplValueType(v) match {
      case 1 =>
        val fits = try { val l = java.lang.Long.parseLong(v.trim); l >= Int.MinValue && l <= Int.MaxValue }
        catch { case _: Exception => false }
        if (fits) CInt else CInt64
      case 2 => CReal
      case _ =>
        val lower = v.toLowerCase(java.util.Locale.ROOT)
        if (lower == "inf" || lower == "-inf" || lower == "nan") CReal
        else if (parsesAsDate(v)) {
          val hasDate = v.contains('/') || v.contains('-')
          val hasTime = v.contains(':')
          if (hasDate && hasTime) CDateTime
          else if (hasDate) CDate
          else CTime
        } else if (TrueWords.contains(lower) || FalseWords.contains(lower)) CBool
        else CStr
    }
  }

  // ------------------------------------------------------------- distribute

  /** Sniff OGR field types for `cols` of `df`, processing rows in
    * `orderCol` order (the file order of the CSV). One pass: range
    * partitioning gives ordered partitions, each reduces to a 32-entry
    * transition table per column, the driver composes tables in order. */
  def sniff(df: DataFrame, orderCol: String, cols: Seq[String]): Seq[(String, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val proj = df.select(col(orderCol).cast("long").as("_ord") +:
      cols.map(c => col(c).cast("string").as(c)): _*)
    val nCols = cols.length
    val parts = proj
      .repartitionByRange(math.max(1, proj.rdd.getNumPartitions), col("_ord"))
      .sortWithinPartitions("_ord")
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val tables = Array.fill(nCols)(Array.tabulate(32)(identity))
          var minOrd = Long.MaxValue
          it.foreach { row =>
            val o = row.getLong(0)
            if (o < minOrd) minOrd = o
            var c = 0
            while (c < nCols) {
              val v = if (row.isNullAt(c + 1)) "" else row.getString(c + 1)
              val cls = classify(v)
              if (cls != CEmpty) {
                val tab = tables(c)
                var s = 0
                while (s < 32) { tab(s) = step(tab(s), cls); s += 1 }
              }
              c += 1
            }
          }
          Iterator.single((minOrd, tables.map(_.clone())))
        }
      }.collect().sortBy(_._1)
    cols.indices.map { c =>
      var state = enc(UNSET, b = false, f = false)
      parts.foreach { case (_, tables) => state = tables(c)(state) }
      (cols(c), typeName(state))
    }
  }
}
