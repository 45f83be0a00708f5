package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OGR SQL dialect **text entry point**: parse an OGR-SQL string and plan it
  * onto DataFrames — the Spark twin of `GDALDataset::ExecuteSQL` with the
  * default "OGRSQL" dialect (reference: gcore/gdaldataset.cpp:7411-7455
  * dispatching into the swq parser, ogr/swq_parser.y:821-840).
  *
  * Grammar subset (the full OGRSQL surface minus DDL):
  *   SELECT [DISTINCT] item, ...  FROM layer [alias]
  *     [[LEFT] JOIN layer [alias] ON a.col = b.col]...
  *     [WHERE expr] [ORDER BY col [ASC|DESC], ...]
  *     [LIMIT n] [OFFSET m] [UNION ALL select]
  * with items `*`, `table.*`, `* EXCEPT (cols)`, expressions with optional
  * aliases, aggregates (MIN/MAX/AVG/SUM/COUNT/STDDEV_POP/STDDEV_SAMP),
  * CAST, CONCAT, SUBSTR, HSTORE_GET_VALUE, and the FID special field.
  * Operator precedence mirrors swq_parser.y:89-97
  * (OR < AND < NOT < comparisons < +- < * / % < unary minus).
  *
  * Dialect semantics preserved (all gated, see OgrSqlSpec + q21-q23):
  *  - string `=`/`<>`/ordering comparisons are case-insensitive
  *    (swq_op_general.cpp strcasecmp branches; OgrCompat.eqCi)
  *  - LIKE is case-SENSITIVE, ILIKE insensitive (swq_op_general.cpp:1090-1127;
  *    OGR_SQL_LIKE_AS_ILIKE default FALSE), both with optional ESCAPE
  *  - BETWEEN and IN on strings compare case-insensitively
  *    (swq_op_general.cpp:1080-1087)
  *  - integer `/0` and `%0` yield INT_MAX (swq_op_general.cpp:679-705)
  *  - `+` with a string left operand concatenates (swq_op_general.cpp:1135)
  *  - a string used as a number parses its leading numeric prefix, CPLAtof
  *    style (OgrCompat.strToNum)
  *  - AND null iff both null; OR null if either null (swq_op_general.cpp:545)
  *  - DISTINCT returns first-appearance order (swq.cpp insertion-ordered set,
  *    pinned by autotest/ogr/ogr_sql_test.py:196-234)
  *  - JOIN is first-match-only and left-driven (ogr_gensql.cpp:1516-1546)
  *  - SUBSTR accepts negative offsets counting from the string end, clamped
  *    to the string start (swq_op_general.cpp:1147-1190)
  *  - summary aggregates name their outputs `<func>_<col>` / `count_*`
  *    (ogr_gensql.cpp:220)
  *  - without ORDER BY, rows come back in primary-layer scan order (GDAL
  *    iterator semantics). At scale callers can pass ordered=false to skip
  *    the global sort; correctness gates hash order-free anyway.
  */
object OgrSql {

  /** A registered layer: the DataFrame plus (optionally) which column is the
    * FID — excluded from `*` expansion, addressable as `FID`, and used as the
    * deterministic scan-order key (GDAL reads features in FID order).
    *
    * `indexed` is the attribute-index registry — the analog of the
    * reference's per-layer OGRLayerAttrIndex side files (.ind/.idm,
    * ogrsf_frmts/generic/ogrlayerattrindex built by CREATE INDEX,
    * gcore/gdaldataset.cpp:6683). Like the reference, an index never
    * changes feature content or scan order; it only records which fields
    * have a lookup structure. [[OgrSql.clusterByIndex]] is the physical
    * counterpart for materialized layers. Field names are stored lowercase. */
  final case class Layer(df: DataFrame, fid: Option[String] = None,
                         indexed: Set[String] = Set.empty,
                         geom: Option[String] = None,
                         style: Option[String] = None)

  // =====================================================================
  // Lexer
  // =====================================================================
  private sealed trait Tok
  private case class TId(s: String) extends Tok          // bare identifier
  private case class TQId(s: String) extends Tok         // "quoted" identifier
  private case class TStr(s: String) extends Tok         // 'string literal'
  private case class TInt(v: Long) extends Tok
  private case class TFloat(v: Double) extends Tok
  private case class TOp(s: String) extends Tok
  private case object TEnd extends Tok

  private def lex(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    def peek(k: Int = 0): Char = if (i + k < n) sql.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') { // string literal, '' escapes a quote
        val sb = new StringBuilder; i += 1
        var done = false
        while (!done) {
          if (i >= n) throw new IllegalArgumentException("unterminated string literal")
          val ch = sql.charAt(i)
          if (ch == '\'') {
            if (peek(1) == '\'') { sb.append('\''); i += 2 }
            else { done = true; i += 1 }
          } else { sb.append(ch); i += 1 }
        }
        out += TStr(sb.toString)
      } else if (c == '"') { // quoted identifier
        val sb = new StringBuilder; i += 1
        while (i < n && sql.charAt(i) != '"') { sb.append(sql.charAt(i)); i += 1 }
        if (i >= n) throw new IllegalArgumentException("unterminated quoted identifier")
        i += 1
        out += TQId(sb.toString)
      } else if (c.isDigit || (c == '.' && peek(1).isDigit)) {
        val start = i
        var isFloat = false
        while (peek().isDigit) i += 1
        if (peek() == '.') { isFloat = true; i += 1; while (peek().isDigit) i += 1 }
        if (peek() == 'e' || peek() == 'E') {
          isFloat = true; i += 1
          if (peek() == '+' || peek() == '-') i += 1
          while (peek().isDigit) i += 1
        }
        val text = sql.substring(start, i)
        if (isFloat) out += TFloat(text.toDouble)
        else scala.util.Try(text.toLong) match { // overflow → float, like swq
          case scala.util.Success(v) => out += TInt(v)
          case scala.util.Failure(_) => out += TFloat(text.toDouble)
        }
      } else if (c.isLetter || c == '_') {
        val start = i
        while (peek().isLetterOrDigit || peek() == '_') i += 1
        out += TId(sql.substring(start, i))
      } else {
        val two = if (i + 1 < n) sql.substring(i, i + 2) else ""
        if (two == "<>" || two == "!=" || two == "<=" || two == ">=") { out += TOp(two); i += 2 }
        else if ("=<>+-*/%(),.".indexOf(c) >= 0) { out += TOp(c.toString); i += 1 }
        else if (c == '*') { out += TOp("*"); i += 1 }
        else throw new IllegalArgumentException(s"unexpected character '$c' at $i in OGR SQL")
      }
    }
    out += TEnd
    out.result()
  }

  // =====================================================================
  // AST
  // =====================================================================
  private sealed trait Ex
  private case class LitL(v: Long) extends Ex
  private case class LitD(v: Double) extends Ex
  private case class LitS(v: String) extends Ex
  private case object LitNull extends Ex
  private case class ColRef(table: Option[String], name: String) extends Ex
  private case class Bin(op: String, l: Ex, r: Ex) extends Ex   // OR AND = <> < > <= >= + - * / %
  private case class Not(e: Ex) extends Ex
  private case class Neg(e: Ex) extends Ex
  private case class LikeE(e: Ex, pat: Ex, esc: Option[Ex], ci: Boolean, neg: Boolean) extends Ex
  private case class InE(e: Ex, list: Seq[Ex], neg: Boolean) extends Ex
  private case class BetweenE(e: Ex, lo: Ex, hi: Ex, neg: Boolean) extends Ex
  private case class IsNullE(e: Ex, neg: Boolean) extends Ex
  private case class FuncE(name: String, args: Seq[Ex], distinct: Boolean = false, star: Boolean = false) extends Ex
  private case class CastE(e: Ex, to: String, len: Option[Int]) extends Ex

  private sealed trait Item
  private case class Star(table: Option[String], except: Seq[String]) extends Item
  private case class ExprItem(e: Ex, alias: Option[String]) extends Item

  private case class TableRef(name: String, alias: Option[String])
  private case class JoinClause(table: TableRef, on: Ex)
  private case class Sel(distinct: Boolean, items: Seq[Item], from: TableRef,
                         joins: Seq[JoinClause], where: Option[Ex],
                         orderBy: Seq[(Ex, Boolean)], limit: Option[Long],
                         offset: Option[Long], union: Option[Sel])

  // =====================================================================
  // Parser (recursive descent, precedence per swq_parser.y:89-97)
  // =====================================================================
  private val keywords = Set("select", "distinct", "from", "where", "order",
    "by", "asc", "desc", "limit", "offset", "union", "all", "join", "left",
    "on", "as", "and", "or", "not", "in", "like", "ilike", "between", "is",
    "null", "escape", "cast", "except", "exclude", "hidden")

  private val aggFuncs = Set("min", "max", "avg", "sum", "count", "stddev_pop", "stddev_samp")

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    def peek: Tok = toks(pos)
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def isKw(kw: String): Boolean = peek match {
      case TId(s) => s.equalsIgnoreCase(kw)
      case _ => false
    }
    def eatKw(kw: String): Boolean = if (isKw(kw)) { pos += 1; true } else false
    def expectKw(kw: String): Unit =
      if (!eatKw(kw)) fail(s"expected $kw")
    def isOp(op: String): Boolean = peek match {
      case TOp(s) => s == op
      case _ => false
    }
    def eatOp(op: String): Boolean = if (isOp(op)) { pos += 1; true } else false
    def expectOp(op: String): Unit = if (!eatOp(op)) fail(s"expected '$op'")
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"OGR SQL parse error: $msg at token ${toks(pos)}")

    def parseQuery(): Sel = {
      val s = parseSelect()
      peek match {
        case TEnd => s
        case t => fail(s"trailing input $t")
      }
    }

    def parseSelect(): Sel = {
      expectKw("select")
      val distinct = eatKw("distinct")
      val items = parseItems()
      expectKw("from")
      val from = parseTableRef()
      val joins = Vector.newBuilder[JoinClause]
      while (isKw("left") || isKw("join")) {
        eatKw("left")
        expectKw("join")
        val t = parseTableRef()
        expectKw("on")
        val on = parseExpr()
        joins += JoinClause(t, on)
      }
      val where = if (eatKw("where")) Some(parseExpr()) else None
      val orderBy =
        if (eatKw("order")) {
          expectKw("by")
          val keys = Vector.newBuilder[(Ex, Boolean)]
          var more = true
          while (more) {
            val e = parseExpr()
            val asc = if (eatKw("desc")) false else { eatKw("asc"); true }
            keys += ((e, asc))
            more = eatOp(",")
          }
          keys.result()
        } else Vector.empty
      val limit = if (eatKw("limit")) Some(parseIntLit()) else None
      val offset = if (eatKw("offset")) Some(parseIntLit()) else None
      val union = if (eatKw("union")) { expectKw("all"); Some(parseSelect()) } else None
      Sel(distinct, items, from, joins.result(), where, orderBy, limit, offset, union)
    }

    private def parseIntLit(): Long = next() match {
      case TInt(v) => v
      case t => fail(s"expected integer, got $t")
    }

    private def parseItems(): Seq[Item] = {
      val items = Vector.newBuilder[Item]
      var more = true
      while (more) {
        items += parseItem()
        more = eatOp(",")
      }
      items.result()
    }

    private def parseItem(): Item = {
      if (eatOp("*")) {
        // `* EXCEPT (a, b)` / EXCLUDE — swq_parser.y:866-867
        if (isKw("except") || isKw("exclude")) {
          next(); expectOp("(")
          val cols = Vector.newBuilder[String]
          var more = true
          while (more) { cols += parseIdent(); more = eatOp(",") }
          expectOp(")")
          Star(None, cols.result().map(_.toLowerCase))
        } else Star(None, Nil)
      } else {
        // table.* lookahead
        (peek, toks(pos + 1), toks(pos + 2)) match {
          case (TId(t), TOp("."), TOp("*")) => pos += 3; Star(Some(t.toLowerCase), Nil)
          case (TQId(t), TOp("."), TOp("*")) => pos += 3; Star(Some(t.toLowerCase), Nil)
          case _ =>
            val e = parseExpr()
            val alias =
              if (eatKw("as")) Some(parseIdent())
              else peek match { // bare alias: identifier that is not a keyword
                case TId(s) if !keywords.contains(s.toLowerCase) => pos += 1; Some(s)
                case TQId(s) => pos += 1; Some(s)
                case _ => None
              }
            ExprItem(e, alias)
        }
      }
    }

    private def parseIdent(): String = next() match {
      case TId(s) => s
      case TQId(s) => s
      case t => fail(s"expected identifier, got $t")
    }

    private def parseTableRef(): TableRef = {
      val name = next() match {
        case TId(s) => s
        case TQId(s) => s
        case TStr(s) => s // grammar accepts 'layer name' strings
        case t => fail(s"expected table name, got $t")
      }
      val alias =
        if (eatKw("as")) Some(parseIdent())
        else peek match {
          case TId(s) if !keywords.contains(s.toLowerCase) => pos += 1; Some(s)
          case _ => None
        }
      TableRef(name, alias)
    }

    // ---- expressions ----
    def parseExpr(): Ex = parseOr()

    private def parseOr(): Ex = {
      var l = parseAnd()
      while (eatKw("or")) l = Bin("or", l, parseAnd())
      l
    }
    private def parseAnd(): Ex = {
      var l = parseNot()
      while (isKw("and") && !betweenAndGuard) { eatKw("and"); l = Bin("and", l, parseNot()) }
      l
    }
    // BETWEEN's AND is consumed inside parseCmp; this guard is never hit in
    // practice because parseCmp eats it eagerly, but keeps intent explicit.
    private def betweenAndGuard: Boolean = false

    private def parseNot(): Ex =
      if (eatKw("not")) Not(parseNot()) else parseCmp()

    private def parseCmp(): Ex = {
      val l = parseAdd()
      if (isOp("=") || isOp("<>") || isOp("!=") || isOp("<") || isOp(">") || isOp("<=") || isOp(">=")) {
        val TOp(op) = next(): @unchecked
        val norm = if (op == "!=") "<>" else op
        Bin(norm, l, parseAdd())
      } else if (isKw("like") || isKw("ilike")) {
        val ci = isKw("ilike"); next()
        val pat = parseAdd()
        val esc = if (eatKw("escape")) Some(parseAdd()) else None
        LikeE(l, pat, esc, ci, neg = false)
      } else if (isKw("in")) {
        next(); expectOp("(")
        val list = Vector.newBuilder[Ex]
        var more = true
        while (more) { list += parseExpr(); more = eatOp(",") }
        expectOp(")")
        InE(l, list.result(), neg = false)
      } else if (isKw("between")) {
        next()
        val lo = parseAdd(); expectKw("and"); val hi = parseAdd()
        BetweenE(l, lo, hi, neg = false)
      } else if (isKw("is")) {
        next()
        val neg = eatKw("not")
        expectKw("null")
        IsNullE(l, neg)
      } else if (isKw("not")) {
        // x NOT LIKE / NOT IN / NOT BETWEEN / NOT ILIKE
        next()
        if (isKw("like") || isKw("ilike")) {
          val ci = isKw("ilike"); next()
          val pat = parseAdd()
          val esc = if (eatKw("escape")) Some(parseAdd()) else None
          LikeE(l, pat, esc, ci, neg = true)
        } else if (isKw("in")) {
          next(); expectOp("(")
          val list = Vector.newBuilder[Ex]
          var more = true
          while (more) { list += parseExpr(); more = eatOp(",") }
          expectOp(")")
          InE(l, list.result(), neg = true)
        } else if (isKw("between")) {
          next()
          val lo = parseAdd(); expectKw("and"); val hi = parseAdd()
          BetweenE(l, lo, hi, neg = true)
        } else fail("expected LIKE/ILIKE/IN/BETWEEN after NOT")
      } else l
    }

    private def parseAdd(): Ex = {
      var l = parseMul()
      while (isOp("+") || isOp("-")) {
        val TOp(op) = next(): @unchecked
        l = Bin(op, l, parseMul())
      }
      l
    }
    private def parseMul(): Ex = {
      var l = parseUnary()
      while (isOp("*") || isOp("/") || isOp("%")) {
        val TOp(op) = next(): @unchecked
        l = Bin(op, l, parseUnary())
      }
      l
    }
    private def parseUnary(): Ex =
      if (eatOp("-")) Neg(parseUnary()) else parsePrimary()

    private def parsePrimary(): Ex = next() match {
      case TInt(v) => LitL(v)
      case TFloat(v) => LitD(v)
      case TStr(s) => LitS(s)
      case TOp("(") =>
        val e = parseExpr(); expectOp(")"); e
      case TId(s) if s.equalsIgnoreCase("null") => LitNull
      case TId(s) if s.equalsIgnoreCase("cast") =>
        expectOp("(")
        val e = parseExpr()
        expectKw("as")
        val ty = parseIdent().toLowerCase
        val len = if (eatOp("(")) { val v = parseIntLit().toInt; expectOp(")"); Some(v) } else None
        expectOp(")")
        CastE(e, ty, len)
      case TId(s) if isOp("(") =>
        pos += 1 // consume '('
        val fname = s.toLowerCase
        if (eatOp("*")) { // COUNT(*)
          expectOp(")")
          FuncE(fname, Nil, star = true)
        } else {
          val distinct = eatKw("distinct")
          val args = Vector.newBuilder[Ex]
          if (!isOp(")")) {
            var more = true
            while (more) { args += parseExpr(); more = eatOp(",") }
          }
          expectOp(")")
          FuncE(fname, args.result(), distinct = distinct)
        }
      case TId(s) =>
        if (isOp(".")) {
          pos += 1
          val c = parseIdent()
          ColRef(Some(s.toLowerCase), c.toLowerCase)
        } else ColRef(None, s.toLowerCase)
      case TQId(s) =>
        if (isOp(".")) {
          pos += 1
          val c = parseIdent()
          ColRef(Some(s.toLowerCase), c.toLowerCase)
        } else ColRef(None, s.toLowerCase)
      case t => fail(s"unexpected token $t")
    }
  }

  // =====================================================================
  // Planner
  // =====================================================================
  /** Simple type lattice for quirk dispatch (swq field types). */
  private sealed trait Ty
  private case object TyStr extends Ty
  private case object TyInt extends Ty
  private case object TyFloat extends Ty
  private case object TyBool extends Ty
  private case object TyOther extends Ty

  private def tyOf(dt: DataType): Ty = dt match {
    case StringType => TyStr
    case ByteType | ShortType | IntegerType | LongType => TyInt
    case FloatType | DoubleType | _: DecimalType => TyFloat
    case BooleanType => TyBool
    case _ => TyOther
  }

  private case class Tbl(alias: String, name: String, idx: Int,
                         cols: Seq[(String, DataType)], fid: Option[String],
                         specials: Map[String, DataType] = Map.empty) {
    def pref(c: String): String = s"__t${idx}_${c.toLowerCase}"
    val ord: String = s"__t${idx}_#ord"
    def has(c: String): Boolean = cols.exists(_._1.equalsIgnoreCase(c))
    def hasSpecial(c: String): Boolean = specials.contains(c.toLowerCase)
    def dtype(c: String): DataType =
      cols.find(_._1.equalsIgnoreCase(c)).map(_._2)
        .getOrElse(specials(c.toLowerCase))
  }

  private class Planner(spark: SparkSession, layers: Map[String, Layer], ordered: Boolean) {
    private def layer(name: String): Layer =
      layers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
        .getOrElse(throw new IllegalArgumentException(s"unknown layer '$name'"))

    /** Load + prefix one table; __ord = FID column else a stable per-row id.
      * Layers registered with a geometry column also expose the OGR special
      * fields OGR_GEOMETRY / OGR_GEOM_WKT / OGR_GEOM_AREA (+ OGR_STYLE when
      * a style column is registered) — resolvable by name but excluded from
      * `*` expansion, exactly the reference's SpecialFieldNames contract
      * (ogr/ogrfeaturequery.cpp:38, ogr_gensql.cpp special-field columns). */
    private def load(tr: TableRef, idx: Int): (DataFrame, Tbl) = {
      val l = layer(tr.name)
      val alias = tr.alias.getOrElse(tr.name).toLowerCase
      val visible = l.df.schema.fields.toSeq
        .filterNot(f => l.fid.exists(_.equalsIgnoreCase(f.name)))
        .map(f => (f.name, f.dataType))
      val specials: Map[String, DataType] =
        l.geom.map(_ => Map(
          "ogr_geometry" -> (StringType: DataType),
          "ogr_geom_wkt" -> (StringType: DataType),
          "ogr_geom_area" -> (DoubleType: DataType))).getOrElse(Map.empty) ++
        l.style.map(_ => "ogr_style" -> (StringType: DataType))
      val t = Tbl(alias, tr.name.toLowerCase, idx, visible, l.fid, specials)
      val ordCol: Column = l.fid.map(c => col(c).cast("long"))
        .getOrElse(monotonically_increasing_id())
      val extra: Seq[Column] = l.geom.toSeq.flatMap { g =>
        Seq(expr(s"st_geometrytype($g)").as(t.pref("ogr_geometry")),
          expr(s"st_astext($g)").as(t.pref("ogr_geom_wkt")),
          expr(s"st_area($g)").as(t.pref("ogr_geom_area")))
      } ++ l.style.map(sc => col(sc).as(t.pref("ogr_style")))
      val prefixed = l.df.select(
        (l.df.schema.fieldNames.toSeq.map(c => col(c).as(t.pref(c))) ++
          extra :+ ordCol.as(t.ord)): _*)
      (prefixed, t)
    }

    private var tables: Seq[Tbl] = Nil

    private def resolve(c: ColRef): (Tbl, String) = {
      if (c.table.isEmpty && c.name == "fid") {
        val t = tables.head
        val f = t.fid.getOrElse(throw new IllegalArgumentException(
          s"layer ${t.name} has no FID column registered"))
        return (t, f)
      }
      c.table match {
        case Some(tn) =>
          val t = tables.find(t => t.alias == tn || t.name == tn)
            .getOrElse(throw new IllegalArgumentException(s"unknown table '$tn'"))
          if (c.name == "fid" && t.fid.isDefined) (t, t.fid.get)
          else if (t.has(c.name) || t.hasSpecial(c.name)) (t, c.name)
          else throw new IllegalArgumentException(s"unknown column '$tn.${c.name}'")
        case None =>
          val hits = tables.filter(t => t.has(c.name) || t.hasSpecial(c.name))
          if (hits.isEmpty) throw new IllegalArgumentException(s"unknown column '${c.name}'")
          (hits.head, c.name) // first table wins on ambiguity, like swq field lookup
      }
    }

    /** Translate an expression → (Column, inferred swq-ish type). */
    private def tr(e: Ex): (Column, Ty) = e match {
      case LitL(v) => (lit(v), TyInt)
      case LitD(v) => (lit(v), TyFloat)
      case LitS(v) => (lit(v), TyStr)
      case LitNull => (lit(null).cast("string"), TyOther)
      case c: ColRef =>
        val (t, name) = resolve(c)
        if (t.fid.exists(_.equalsIgnoreCase(name))) (col(t.pref(name)).cast("long"), TyInt)
        else (col(t.pref(name)), tyOf(t.dtype(name)))
      case Not(x) =>
        val (cx, _) = tr(x); (!cx, TyBool)
      case Neg(x) =>
        val (cx, ty) = tr(x); (-cx, ty)
      case Bin("or", l, r) =>
        val (cl, _) = tr(l); val (cr, _) = tr(r)
        (OgrCompat.orOgr(cl, cr), TyBool)
      case Bin("and", l, r) =>
        val (cl, _) = tr(l); val (cr, _) = tr(r)
        (OgrCompat.andOgr(cl, cr), TyBool)
      case Bin(op @ ("=" | "<>" | "<" | ">" | "<=" | ">="), l, r) =>
        val (cl, tl) = tr(l); val (cr, tr0) = tr(r)
        val (nl, nr) = normalizeCmp(cl, tl, cr, tr0)
        val res = op match {
          case "=" => nl === nr
          case "<>" => nl =!= nr
          case "<" => nl < nr
          case ">" => nl > nr
          case "<=" => nl <= nr
          case ">=" => nl >= nr
        }
        (res, TyBool)
      case Bin("+", l, r) =>
        val (cl, tl) = tr(l); val (cr, _) = tr(r)
        if (tl == TyStr) (concat(cl, cr.cast("string")), TyStr)
        else (numArith(cl, tl)._1 + numVal(r), arithTy(l, r))
      case Bin("-", l, r) => (numVal(l) - numVal(r), arithTy(l, r))
      case Bin("*", l, r) => (numVal(l) * numVal(r), arithTy(l, r))
      case Bin("/", l, r) =>
        val ty = arithTy(l, r)
        if (ty == TyInt) (OgrCompat.intDiv(numVal(l), numVal(r)), TyInt)
        else (numVal(l) / numVal(r), TyFloat)
      case Bin("%", l, r) =>
        val ty = arithTy(l, r)
        if (ty == TyInt) (OgrCompat.intMod(numVal(l), numVal(r)), TyInt)
        else (numVal(l) % numVal(r), TyFloat)
      case Bin(op, _, _) => throw new IllegalArgumentException(s"unsupported operator $op")
      case LikeE(x, pat, esc, ci, neg) =>
        val (cx, _) = tr(x)
        // swq_test_like (ogr/swq.cpp): the escape character makes the NEXT
        // char literal — ANY char, not just wildcards (Spark's LIKE rejects
        // escaping ordinary chars, so literal patterns compile to an
        // anchored regex instead; rfc28 test 25 'x35043408' ESCAPE 'x').
        val matched = (pat, esc) match {
          case (LitS(p), None) => cx.rlike(likeRegex(p, '\u0000', ci))
          case (LitS(p), Some(LitS(e))) if e.nonEmpty =>
            cx.rlike(likeRegex(p, e.charAt(0), ci))
          case _ => // non-literal pattern: delegate to Spark's like/ilike
            val (cp, _) = tr(pat)
            if (ci) call_function("ilike", cx, cp) else call_function("like", cx, cp)
        }
        (if (neg) !matched else matched, TyBool)
      case InE(x, list, neg) =>
        val (cx, tx) = tr(x)
        val items = list.map(tr)
        val anyStr = tx == TyStr || items.exists(_._2 == TyStr)
        val base =
          if (anyStr && tx == TyStr) lower(cx).isin(items.map(i => lower(i._1.cast("string"))): _*)
          else cx.isin(items.map(_._1): _*)
        (if (neg) !base else base, TyBool)
      case BetweenE(x, lo, hi, neg) =>
        val (cx, tx) = tr(x); val (cl, tl) = tr(lo); val (ch, th) = tr(hi)
        val strMode = tx == TyStr && tl == TyStr && th == TyStr
        val base =
          if (strMode) lower(cx) >= lower(cl) && lower(cx) <= lower(ch) // strcasecmp BETWEEN
          else cx >= cl && cx <= ch
        (if (neg) !base else base, TyBool)
      case IsNullE(x, neg) =>
        val (cx, _) = tr(x)
        (if (neg) cx.isNotNull else cx.isNull, TyBool)
      case CastE(x, to, len) =>
        val (cx, _) = tr(x)
        castTo(cx, to, len)
      case f: FuncE => scalarFunc(f)
    }

    /** Comparison normalization: strings compare case-insensitively; a string
      * compared to a number is coerced CPLAtof-style. */
    private def normalizeCmp(cl: Column, tl: Ty, cr: Column, tr0: Ty): (Column, Column) =
      (tl, tr0) match {
        case (TyStr, TyStr) => (lower(cl), lower(cr))
        case (TyStr, TyInt | TyFloat) => (OgrCompat.strToNum(cl), cr.cast("double"))
        case (TyInt | TyFloat, TyStr) => (cl.cast("double"), OgrCompat.strToNum(cr))
        case _ => (cl, cr)
      }

    private def numVal(e: Ex): Column = {
      val (c, ty) = tr(e)
      ty match {
        case TyStr => OgrCompat.strToNum(c)
        case _ => c
      }
    }
    private def numArith(c: Column, ty: Ty): (Column, Ty) =
      if (ty == TyStr) (OgrCompat.strToNum(c), TyFloat) else (c, ty)

    private def exprTy(e: Ex): Ty = tr(e)._2
    private def arithTy(l: Ex, r: Ex): Ty =
      (exprTy(l), exprTy(r)) match {
        case (TyInt, TyInt) => TyInt
        case _ => TyFloat
      }

    private def castTo(c: Column, to: String, len: Option[Int]): (Column, Ty) = to match {
      case "character" | "varchar" | "char" | "string" =>
        val s = c.cast("string")
        (len.map(n => substring(s, 1, n)).getOrElse(s), TyStr)
      case "integer" | "int" | "smallint" => (c.cast("int"), TyInt)
      case "integer64" | "bigint" => (c.cast("long"), TyInt)
      case "float" | "real" | "double" | "numeric" => (c.cast("double"), TyFloat)
      case "boolean" => (c.cast("boolean"), TyBool)
      case "date" => (c.cast("date"), TyOther)
      case "timestamp" => (c.cast("timestamp"), TyOther)
      case "time" => (c.cast("string"), TyStr)
      case other => throw new IllegalArgumentException(s"unsupported CAST target '$other'")
    }

    /** OGR LIKE pattern → anchored Java regex. The escape character makes
      * the following character literal whatever it is (swq_test_like,
      * ogr/swq.cpp); '%' → .*, '_' → . ; '\u0000' = no escape configured. */
    private def likeRegex(pat: String, esc: Char, ci: Boolean): String = {
      val sb = new StringBuilder(if (ci) "(?is)^" else "(?s)^")
      var i = 0
      while (i < pat.length) {
        val c = pat.charAt(i)
        if (c == esc && i + 1 < pat.length) {
          sb.append(java.util.regex.Pattern.quote(pat.charAt(i + 1).toString))
          i += 2
        } else if (c == '%') { sb.append(".*"); i += 1 }
        else if (c == '_') { sb.append("."); i += 1 }
        else { sb.append(java.util.regex.Pattern.quote(c.toString)); i += 1 }
      }
      sb.append("$").toString
    }

    /** Non-aggregate function translation. */
    private def scalarFunc(f: FuncE): (Column, Ty) = f.name match {
      case "concat" =>
        (concat(f.args.map(a => tr(a)._1.cast("string")): _*), TyStr)
      case "substr" =>
        // OGR SUBSTR with negative offsets (swq_op_general.cpp:1147-1190):
        // off>0 → off-1 0-based; off<0 → max(len+off, 0); clamp + empty cases.
        val src = tr(f.args(0))._1.cast("string")
        val off = tr(f.args(1))._1.cast("int")
        val size = if (f.args.size > 2) tr(f.args(2))._1.cast("int") else lit(100000)
        val srcLen = length(src)
        val start0 = when(off > 0, off - 1)
          .when(off < 0, greatest(srcLen + off, lit(0)))
          .otherwise(lit(0))
        val res = when(size < 0 || start0 > srcLen, lit(""))
          .otherwise(call_function("substring", src, start0 + lit(1), size))
        (res, TyStr)
      case "hstore_get_value" =>
        val hs = tr(f.args(0))._1
        val key = tr(f.args(1))._1
        (element_at(call_function("str_to_map", hs, lit(","), lit("=>")), key), TyStr)
      case name if aggFuncs.contains(name) =>
        throw new IllegalArgumentException(
          s"aggregate $name only allowed at the top level of the select list")
      case other =>
        // fall through to the session FunctionRegistry (st_* etc.) — the
        // bAcceptCustomFuncs branch of swq_parser.y:707-716
        (call_function(other, f.args.map(a => tr(a)._1): _*), TyOther)
    }

    /** Aggregate translation for summary mode (ogr_gensql.cpp summary fields). */
    private def aggColumn(f: FuncE): Column = {
      if (f.star) return count(lit(1))
      val (c, ty) = tr(f.args.head)
      f.name match {
        case "min" => min(c)
        case "max" => max(c)
        case "avg" => avg(if (ty == TyStr) OgrCompat.strToNum(c) else c)
        case "sum" => sum(if (ty == TyStr) OgrCompat.strToNum(c) else c)
        case "count" => if (f.distinct) countDistinct(c) else count(c)
        case "stddev_pop" => stddev_pop(if (ty == TyStr) OgrCompat.strToNum(c) else c)
        case "stddev_samp" => stddev_samp(if (ty == TyStr) OgrCompat.strToNum(c) else c)
        case other => throw new IllegalArgumentException(s"unknown aggregate $other")
      }
    }

    private def isAggItem(i: Item): Boolean = i match {
      case ExprItem(f: FuncE, _) => aggFuncs.contains(f.name)
      case _ => false
    }

    /** Default output field name (ogr_gensql.cpp:220 `<func>_<col>`). */
    private def itemName(e: Ex, idx: Int): String = e match {
      case ColRef(_, n) => n
      case f: FuncE if f.star => s"${f.name}_*"
      case f: FuncE =>
        f.args.headOption match {
          case Some(ColRef(_, n)) => s"${f.name}_$n"
          case _ => s"field_$idx"
        }
      case CastE(x, _, _) => itemName(x, idx)
      case _ => s"field_$idx"
    }

    def plan(sel: Sel): DataFrame = {
      val result = planOne(sel)
      sel.union match {
        case None => result
        case Some(u) =>
          val other = plan(u)
          require(result.columns.length == other.columns.length,
            "UNION ALL branches must have the same column count")
          result.union(other.toDF(result.columns: _*))
      }
    }

    private def planOne(sel: Sel): DataFrame = {
      // FROM + JOINs
      val (df0, t0) = load(sel.from, 0)
      tables = Seq(t0)
      var joined = df0
      sel.joins.zipWithIndex.foreach { case (j, i) =>
        val (dfS, tS) = load(j.table, i + 1)
        tables = tables :+ tS
        // ON must be an equality between two columns (swq join restriction,
        // ogr_gensql.cpp secondary-key lookup)
        val (lc, rc) = j.on match {
          case Bin("=", a: ColRef, b: ColRef) => (a, b)
          case _ => throw new IllegalArgumentException("JOIN ON must be col = col")
        }
        // which side references the new secondary table?
        val (secRef, primRef) = {
          val (ta, _) = resolve(lc)
          if (ta.idx == tS.idx) (lc, rc) else (rc, lc)
        }
        val (tSec, secName) = resolve(secRef)
        require(tSec.idx == tS.idx, "JOIN ON must reference the joined table")
        val (tPrim, primName) = resolve(primRef)
        // normalized keys: string↔string → lower; string↔number → CPLAtof
        val secTy = tyOf(tSec.dtype(secName))
        val primTy = if (tPrim.fid.exists(_.equalsIgnoreCase(primName))) TyInt
                     else tyOf(tPrim.dtype(primName))
        def norm(c: Column, ty: Ty, otherTy: Ty): Column = (ty, otherTy) match {
          case (TyStr, TyStr) => lower(c)
          case (TyStr, _) => OgrCompat.strToNum(c)
          case (_, TyStr) => c.cast("double")
          case _ => c
        }
        val primKey = norm(col(tPrim.pref(primName)), primTy, secTy)
        val secKey = norm(col(tSec.pref(secName)), secTy, primTy)
        // first-match-only: keep the secondary row with the smallest scan
        // order per key (ogr_gensql.cpp:1516-1546), then LEFT join
        val w = Window.partitionBy(secKey).orderBy(col(tS.ord).asc)
        val firstOnly = dfS.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn")
        joined = joined.join(firstOnly, primKey === secKey, "left")
      }

      // WHERE
      val filtered = sel.where match {
        case Some(w) => joined.where(tr(w)._1)
        case None => joined
      }

      // select-list expansion
      val aggMode = sel.items.exists(isAggItem)
      if (aggMode) {
        require(sel.items.forall(isAggItem),
          "mixing aggregates and plain fields requires the SQLite dialect")
        require(!sel.distinct, "SELECT DISTINCT with aggregates is not supported")
        val cols = sel.items.zipWithIndex.map {
          case (ExprItem(f: FuncE, alias), i) =>
            aggColumn(f).as(alias.getOrElse(itemName(f, i)))
          case _ => throw new IllegalStateException("unreachable")
        }
        var out = filtered.agg(cols.head, cols.tail: _*)
        sel.offset.foreach(o => out = out.offset(o.toInt))
        sel.limit.foreach(n => out = out.limit(n.toInt))
        return out
      }

      // non-aggregate projection: compute each output into a temp column so
      // ORDER BY can reference aliases and source columns alike
      val outs: Seq[(String, Column)] = sel.items.zipWithIndex.flatMap {
        case (Star(tbl, except), _) =>
          val ts = tbl match {
            case Some(tn) => tables.filter(t => t.alias == tn || t.name == tn)
            case None => tables
          }
          require(ts.nonEmpty, s"unknown table in ${tbl.getOrElse("*")}.*")
          // secondary-table fields expand as "tablename.fieldname"
          // (ogr_gensql.cpp join field naming, e.g. "poly.EAS_ID")
          ts.flatMap(t => t.cols.collect {
            case (c, _) if !except.contains(c.toLowerCase) =>
              (if (t.idx == 0) c else s"${t.name}.$c", col(t.pref(c)))
          })
        case (ExprItem(e, alias), i) =>
          Seq((alias.getOrElse(itemName(e, i)), tr(e)._1))
      }
      val tmpNames = outs.indices.map(i => s"__o$i")
      var work = filtered
      outs.zip(tmpNames).foreach { case ((_, c), tmp) => work = work.withColumn(tmp, c) }

      val primOrd = col(t0.ord)

      if (sel.distinct) {
        // first-appearance DISTINCT (swq.cpp insertion-ordered set): group on
        // the projected values, remember the earliest source row
        val grouped = work.groupBy(tmpNames.map(col): _*)
          .agg(min(primOrd).as("__first"))
        val sorted =
          if (sel.orderBy.nonEmpty) {
            val keys = sel.orderBy.map { case (e, asc) =>
              val c = orderKey(e, outs, tmpNames)
              if (asc) c.asc else c.desc
            }
            grouped.orderBy(keys: _*)
          } else grouped.orderBy(col("__first").asc)
        var out = sorted.select(tmpNames.zip(outs).map { case (tmp, (name, _)) =>
          col(tmp).as(name) }: _*)
        sel.offset.foreach(o => out = out.offset(o.toInt))
        sel.limit.foreach(n => out = out.limit(n.toInt))
        out
      } else {
        val sorted =
          if (sel.orderBy.nonEmpty) {
            val keys = sel.orderBy.map { case (e, asc) =>
              val c = orderKey(e, outs, tmpNames)
              if (asc) c.asc else c.desc
            }
            // stable secondary key: primary scan order (GDAL sorts are stable)
            work.orderBy(keys :+ primOrd.asc: _*)
          } else if (ordered) work.orderBy(primOrd.asc)
          else work
        var out = sorted.select(tmpNames.zip(outs).map { case (tmp, (name, _)) =>
          col(tmp).as(name) }: _*)
        sel.offset.foreach(o => out = out.offset(o.toInt))
        sel.limit.foreach(n => out = out.limit(n.toInt))
        out
      }
    }

    /** ORDER BY key: an output alias/name if one matches, else a source expr. */
    private def orderKey(e: Ex, outs: Seq[(String, Column)], tmpNames: Seq[String]): Column =
      e match {
        case ColRef(None, n) =>
          outs.indexWhere(_._1.equalsIgnoreCase(n)) match {
            case -1 => tr(e)._1
            case i => col(tmpNames(i))
          }
        case _ => tr(e)._1
      }
  }

  /** Execute an OGR SQL string over the registered layers.
    *
    * @param ordered when true (default), queries without ORDER BY return rows
    *   in primary-layer scan order like GDAL's iterator; pass false at scale
    *   to skip the global sort when row order is irrelevant.
    */
  def execute(spark: SparkSession, sql: String,
              layers: Map[String, Layer], ordered: Boolean = true): DataFrame = {
    // geometry special fields lower to st_* expressions — make sure the
    // registry is loaded even when the caller never touched gf directly
    if (layers.values.exists(_.geom.isDefined))
      graft.functions.GraftFunctions.register(spark)
    val ast = new P(lex(sql)).parseQuery()
    new Planner(spark, layers, ordered).plan(ast)
  }

  /** DDL surface of ExecuteSQL — the statement families the reference
    * special-cases before the swq parser
    * (/root/reference/gcore/gdaldataset.cpp:7460-7540):
    *   ALTER TABLE <layer> ADD    [COLUMN] <name> <type>[(w[,p])]
    *   ALTER TABLE <layer> DROP   [COLUMN] <name>
    *   ALTER TABLE <layer> RENAME [COLUMN] <old> TO <new>
    *   ALTER TABLE <layer> ALTER  [COLUMN] <name> TYPE <type>[(w[,p])]
    *   ALTER TABLE <layer> RENAME TO <newname>       (layer rename)
    *   DROP TABLE <layer>
    *   CREATE INDEX ON <layer> USING <field>         (gdaldataset.cpp:6683)
    *   DROP INDEX ON <layer> [USING <field>]         (gdaldataset.cpp:6768)
    * DataFrames are immutable, so the statement returns an UPDATED layer
    * registry (narrow column ops — no shuffle, no data rewrite; the
    * reference rewrites the attribute section in place, which is the one
    * semantic we intentionally trade for Spark's lazy columnar relayout).
    * CREATE/DROP INDEX maintain [[Layer.indexed]]: like the reference's
    * .ind side files they never alter feature content or order — query
    * results are identical with or without the index (ogr_index_test.py
    * asserts exactly this). The physical speed-up analog for materialized
    * layers is [[clusterByIndex]] (range-clustered parquet gets row-group
    * min/max skipping on the indexed field, the Spark twin of an attribute
    * B-tree probe). Identifier matching is case-insensitive like the
    * reference. */
  def executeDdl(spark: SparkSession, sql: String,
                 layers: Map[String, Layer]): Map[String, Layer] = {
    val toks = lex(sql)
    var p = 0
    def cur: Tok = toks(p)
    def isKw(s: String): Boolean = cur match {
      case TId(t) => t.equalsIgnoreCase(s)
      case _ => false
    }
    def expectKw(s: String): Unit = {
      if (!isKw(s)) throw new IllegalArgumentException(
        s"expected $s in ALTER TABLE statement, got $cur")
      p += 1
    }
    def maybeKw(s: String): Boolean = { val m = isKw(s); if (m) p += 1; m }
    def ident(): String = cur match {
      case TId(s)  => p += 1; s
      case TQId(s) => p += 1; s
      case other => throw new IllegalArgumentException(s"expected identifier, got $other")
    }
    // <type>[(width[,precision])] → Spark type (GDALDataset type-name map)
    def sqlType(): DataType = {
      val t = ident().toUpperCase
      if (cur == TOp("(")) { // consume and ignore width/precision
        while (cur != TOp(")") && cur != TEnd) p += 1
        if (cur == TOp(")")) p += 1
      }
      t match {
        case "INTEGER" | "INT" | "SMALLINT" => IntegerType
        case "BIGINT" | "INTEGER64" => LongType
        case "FLOAT" | "DOUBLE" | "REAL" | "NUMERIC" | "DECIMAL" => DoubleType
        case "CHARACTER" | "VARCHAR" | "STRING" | "TEXT" => StringType
        case "DATE" => DateType
        case "TIMESTAMP" | "DATETIME" => TimestampType
        case "TIME" => StringType // OGR TIME is stringly in this model
        case other => throw new IllegalArgumentException(s"unknown column type $other")
      }
    }

    def layerKey(lname: String): String =
      layers.keys.find(_.equalsIgnoreCase(lname)).getOrElse(
        throw new IllegalArgumentException(s"unknown layer $lname"))

    if (maybeKw("CREATE")) {
      // CREATE INDEX ON <layer> USING <field> (ProcessSQLCreateIndex,
      // gdaldataset.cpp:6683; double-create is an error like :6733)
      expectKw("INDEX"); expectKw("ON")
      val key = layerKey(ident()); expectKw("USING")
      val layer = layers(key)
      val f = ident()
      val name = layer.df.columns.find(_.equalsIgnoreCase(f)).getOrElse(
        throw new IllegalArgumentException(s"unknown column $f in $key"))
      if (cur != TEnd) throw new IllegalArgumentException(
        s"trailing tokens after CREATE INDEX statement: $cur")
      if (layer.indexed.contains(name.toLowerCase))
        throw new IllegalArgumentException(s"index already exists on $key.$name")
      return layers.updated(key,
        layer.copy(indexed = layer.indexed + name.toLowerCase))
    }

    if (isKw("DROP") && (toks.lift(p + 1) match {
          case Some(TId(t)) => t.equalsIgnoreCase("INDEX") ||
            t.equalsIgnoreCase("TABLE")
          case _ => false
        })) {
      p += 1
      if (maybeKw("INDEX")) {
        // DROP INDEX ON <layer> [USING <field>] (ProcessSQLDropIndex,
        // gdaldataset.cpp:6768; missing index is an error like :6840)
        expectKw("ON")
        val key = layerKey(ident())
        val layer = layers(key)
        if (maybeKw("USING")) {
          val f = ident().toLowerCase
          if (cur != TEnd) throw new IllegalArgumentException(
            s"trailing tokens after DROP INDEX statement: $cur")
          if (!layer.indexed.contains(f))
            throw new IllegalArgumentException(s"no index on $key.$f to drop")
          return layers.updated(key, layer.copy(indexed = layer.indexed - f))
        }
        if (cur != TEnd) throw new IllegalArgumentException(
          s"trailing tokens after DROP INDEX statement: $cur")
        return layers.updated(key, layer.copy(indexed = Set.empty))
      }
      // DROP TABLE <layer> (ProcessSQLDropTable, gdaldataset.cpp:6875)
      expectKw("TABLE")
      val key = layerKey(ident())
      if (cur != TEnd) throw new IllegalArgumentException(
        s"trailing tokens after DROP TABLE statement: $cur")
      return layers - key
    }

    expectKw("ALTER"); expectKw("TABLE")
    val lname = ident()
    val key = layerKey(lname)
    val layer = layers(key)
    def resolve(c: String): String =
      layer.df.columns.find(_.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(s"unknown column $c in $lname"))
    def dropIdx(c: String): Set[String] = layer.indexed - c.toLowerCase

    // ALTER TABLE <layer> RENAME TO <new> — layer-level rename, dispatched
    // before the column forms exactly like the reference's nTokens==6 case
    // (gdaldataset.cpp:7505-7521)
    if (isKw("RENAME") && (toks.lift(p + 1) match {
          case Some(TId(t)) => t.equalsIgnoreCase("TO")
          case _ => false
        })) {
      p += 2
      val nw = ident()
      if (cur != TEnd) throw new IllegalArgumentException(
        s"trailing tokens after ALTER TABLE RENAME statement: $cur")
      return (layers - key).updated(nw, layer)
    }

    val updated: Layer =
      if (maybeKw("ADD")) {
        maybeKw("COLUMN")
        val name = ident(); val ty = sqlType()
        layer.copy(df = layer.df.withColumn(name, lit(null).cast(ty)))
      } else if (maybeKw("DROP")) {
        maybeKw("COLUMN")
        val name = resolve(ident())
        // copy(), not positional Layer(): geom/style registrations survive
        // unless the dropped column IS the geom/style column
        layer.copy(df = layer.df.drop(name),
          fid = layer.fid.filterNot(_.equalsIgnoreCase(name)),
          indexed = dropIdx(name),
          geom = layer.geom.filterNot(_.equalsIgnoreCase(name)),
          style = layer.style.filterNot(_.equalsIgnoreCase(name)))
      } else if (maybeKw("RENAME")) {
        maybeKw("COLUMN")
        val old = resolve(ident()); expectKw("TO"); val nw = ident()
        def follow(o: Option[String]) =
          o.map(f => if (f.equalsIgnoreCase(old)) nw else f)
        layer.copy(df = layer.df.withColumnRenamed(old, nw),
          fid = follow(layer.fid),
          indexed = if (layer.indexed.contains(old.toLowerCase))
            dropIdx(old) + nw.toLowerCase else layer.indexed,
          geom = follow(layer.geom),
          style = follow(layer.style))
      } else if (maybeKw("ALTER")) {
        maybeKw("COLUMN")
        val name = resolve(ident()); expectKw("TYPE"); val ty = sqlType()
        layer.copy(df = layer.df.withColumn(name, col(name).cast(ty)))
      } else throw new IllegalArgumentException(
        s"expected ADD/DROP/RENAME/ALTER after ALTER TABLE $lname, got $cur")
    if (cur != TEnd) throw new IllegalArgumentException(
      s"trailing tokens after ALTER TABLE statement: $cur")
    layers.updated(key, updated)
  }

  /** Physical counterpart of CREATE INDEX for layers about to be
    * materialized: range-cluster the rows on the indexed fields
    * (`repartitionByRange` + `sortWithinPartitions`). Parquet written from
    * this layout carries tight per-row-group min/max stats on those fields,
    * so an equality or range probe — the reference's attribute-index hit
    * path (ogrlayerattrindex, ogr_gensql.cpp first-match join probe) —
    * skips every non-matching row group at scan time. Lazy (no job runs
    * here); one shuffle when materialized, same as the reference's full
    * scan to build the .ind file. No-op for layers with no index. */
  def clusterByIndex(layer: Layer): DataFrame = {
    val fields = layer.df.columns.filter(c => layer.indexed.contains(c.toLowerCase))
    if (fields.isEmpty) layer.df
    else layer.df.repartitionByRange(fields.map(col).toIndexedSeq: _*)
      .sortWithinPartitions(fields.map(col).toIndexedSeq: _*)
  }
}
