package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Minimal XML tree parser shared by the KML/GML geometry codecs — the
  * same no-external-libs discipline as [[Wkt]]/[[GeoJson]] (the reference
  * parses these with its bundled CPLXMLNode mini-parser, cpl_minixml.cpp,
  * for exactly the same reason: geometry fragments don't need a full XML
  * stack). Namespace prefixes are stripped from element names (the
  * reference's BareGMLElement, gml2ogrgeometry.cpp:54-63), attributes are
  * kept (srsDimension), declarations/comments/CDATA are handled, and the
  * five predefined entities are decoded in text. Throws on malformed
  * input — callers wrap and return null (codec convention). */
private[geom] object XmlLite {

  final case class Node(name: String, attrs: Map[String, String],
                        children: Array[Node], text: String) {
    def child(n: String): Option[Node] = children.find(_.name == n)
    def childSeq(n: String): Array[Node] = children.filter(_.name == n)
  }

  def parse(s: String): Node = {
    val p = new P(s)
    p.skipMisc()
    val n = p.element()
    p.skipMisc()
    if (p.pos < s.length) p.fail("trailing content")
    n
  }

  private def bare(name: String): String = {
    val i = name.indexOf(':')
    if (i >= 0) name.substring(i + 1) else name
  }

  private final class P(s: String) {
    var pos = 0
    def fail(m: String): Nothing = throw new IllegalArgumentException(s"xml @$pos: $m")
    private def ws(): Unit = { while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1 }

    def skipMisc(): Unit = {
      var more = true
      while (more) {
        ws()
        if (s.startsWith("<?", pos)) {
          val e = s.indexOf("?>", pos); if (e < 0) fail("unterminated <?")
          pos = e + 2
        } else if (s.startsWith("<!--", pos)) {
          val e = s.indexOf("-->", pos); if (e < 0) fail("unterminated comment")
          pos = e + 3
        } else more = false
      }
    }

    private def name(): String = {
      val st = pos
      while (pos < s.length && {
        val c = s.charAt(pos)
        c.isLetterOrDigit || c == ':' || c == '_' || c == '-' || c == '.'
      }) pos += 1
      if (pos == st) fail("name expected")
      s.substring(st, pos)
    }

    private def decode(t: String): String =
      if (!t.contains('&')) t
      else t.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
        .replace("&apos;", "'").replace("&amp;", "&")

    def element(): Node = {
      if (pos >= s.length || s.charAt(pos) != '<') fail("element expected")
      pos += 1
      val nm = bare(name())
      val attrs = Map.newBuilder[String, String]
      var open = true
      var selfClose = false
      while (open) {
        ws()
        if (pos >= s.length) fail("unterminated tag")
        s.charAt(pos) match {
          case '>' => pos += 1; open = false
          case '/' =>
            if (!s.startsWith("/>", pos)) fail("bad tag end")
            pos += 2; open = false; selfClose = true
          case _ =>
            val an = bare(name())
            ws(); if (pos >= s.length || s.charAt(pos) != '=') fail("= expected"); pos += 1
            ws()
            val q = if (pos < s.length) s.charAt(pos) else ' '
            if (q != '"' && q != '\'') fail("quote expected")
            pos += 1
            val e = s.indexOf(q, pos); if (e < 0) fail("unterminated attr")
            attrs += an -> decode(s.substring(pos, e))
            pos = e + 1
        }
      }
      if (selfClose) return Node(nm, attrs.result(), Array.empty, "")
      val kids = new ArrayBuffer[Node]()
      val text = new java.lang.StringBuilder    // pending non-CDATA chars
      val decoded = new java.lang.StringBuilder // decoded text + raw CDATA
      var closed = false
      while (!closed) {
        if (pos >= s.length) fail(s"unterminated <$nm>")
        if (s.startsWith("<!--", pos)) {
          val e = s.indexOf("-->", pos); if (e < 0) fail("unterminated comment")
          pos = e + 3
        } else if (s.startsWith("<![CDATA[", pos)) {
          val e = s.indexOf("]]>", pos); if (e < 0) fail("unterminated CDATA")
          // CDATA content is VERBATIM: flush-and-decode the pending
          // character data, then append the section raw so entities
          // inside it are not decoded (XML 1.0 §2.7; CPLXMLNode agrees)
          decoded.append(decode(text.toString)); text.setLength(0)
          decoded.append(s, pos + 9, e)
          pos = e + 3
        } else if (s.startsWith("</", pos)) {
          pos += 2
          val cn = bare(name())
          if (cn != nm) fail(s"mismatched </$cn> for <$nm>")
          ws(); if (pos >= s.length || s.charAt(pos) != '>') fail("> expected"); pos += 1
          closed = true
        } else if (s.charAt(pos) == '<') {
          kids += element()
        } else {
          text.append(s.charAt(pos)); pos += 1
        }
      }
      decoded.append(decode(text.toString))
      Node(nm, attrs.result(), kids.toArray, decoded.toString)
    }
  }
}
