package graft.engine

import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/** Mapbox Vector Tile 2.1 codec — the reference's vector tile sink format
  * (driver /root/reference/ogr/ogrsf_frmts/mvt/: writer mvt_tile.cpp with
  * the command/field constants of mvt_tile.h:40-57, reader
  * ogrmvtdataset.cpp; the format itself is the public vector_tile.proto
  * spec). Hand-rolled protobuf wire codec — same no-external-libs
  * discipline as the other text/binary codecs.
  *
  * Wire layout (vector_tile.proto):
  *   Tile: layer = 3 (message)
  *   Layer: version = 15 (varint, 2), name = 1 (string), feature = 2
  *          (message), keys = 3 (string), values = 4 (message),
  *          extent = 5 (varint, default 4096)
  *   Feature: id = 1 (varint), tags = 2 (packed varint pairs), type = 3
  *            (varint: 1 point, 2 linestring, 3 polygon), geometry = 4
  *            (packed varint commands)
  *   Value: string = 1, float = 2, double = 3, int = 4 (varint),
  *          uint = 5, sint = 6 (zigzag), bool = 7
  *
  * Geometry commands (spec §4.3): CommandInteger = (id & 0x7)|(count<<3);
  * MoveTo = 1, LineTo = 2, ClosePath = 7; parameters are zigzag-encoded
  * coordinate DELTAS from the running cursor, y-down tile space, one
  * cursor across the whole geometry. Points/multipoints = one MoveTo with
  * count n; linestrings = MoveTo(1) + LineTo(n−1) per part; polygon rings
  * = MoveTo(1) + LineTo(n−2) + ClosePath (the closing vertex is implied
  * and NOT encoded). Keys/values are deduplicated per layer in first-
  * appearance order (the reference writer's find-or-append maps).
  *
  * Scale shape: vector tiling = assign features to tiles (the engine's
  * TileJob semantics) then ONE groupByKey encodes each tile locally —
  * the same plan as the raster tile sink; a 10^10-feature tiling is one
  * shuffle. */
object Mvt {

  final val CmdMoveTo = 1
  final val CmdLineTo = 2
  final val CmdClosePath = 7
  final val GeomPoint = 1
  final val GeomLineString = 2
  final val GeomPolygon = 3
  final val DefaultExtent = 4096

  sealed trait Value
  final case class VString(v: String) extends Value
  final case class VDouble(v: Double) extends Value
  final case class VLong(v: Long) extends Value
  final case class VBool(v: Boolean) extends Value

  /** Geometry in integer tile coordinates (y-down). Polygon rings include
    * the closing vertex; the encoder drops it per spec. */
  sealed trait TileGeom { def geomType: Int }
  final case class TPoints(pts: Array[(Int, Int)]) extends TileGeom {
    def geomType: Int = GeomPoint
  }
  final case class TLines(parts: Array[Array[(Int, Int)]]) extends TileGeom {
    def geomType: Int = GeomLineString
  }
  final case class TPolys(rings: Array[Array[(Int, Int)]]) extends TileGeom {
    def geomType: Int = GeomPolygon
  }

  final case class Feature(id: Long, geom: TileGeom, tags: Seq[(String, Value)])
  final case class Layer(name: String, extent: Int, features: Seq[Feature])

  // --------------------------------------------------------------- varint

  @inline def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  @inline def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private final class W {
    val b = new ArrayBuffer[Byte](256)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { b += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      b += (v & 0x7f).toByte
    }
    def key(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def bytesField(field: Int, data: Array[Byte]): Unit = {
      key(field, 2); varint(data.length); b ++= data
    }
    def stringField(field: Int, s: String): Unit =
      bytesField(field, s.getBytes("UTF-8"))
    def varintField(field: Int, v: Long): Unit = { key(field, 0); varint(v) }
    def doubleField(field: Int, v: Double): Unit = {
      key(field, 1)
      var bits = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { b += (bits & 0xff).toByte; bits >>>= 8; i += 1 }
    }
    def result: Array[Byte] = b.toArray
  }

  // --------------------------------------------------------------- encode

  /** Public for golden-vector tests against the spec §4.3 examples. */
  def commands(g: TileGeom): Array[Long] = geomCommands(g)

  private def geomCommands(g: TileGeom): Array[Long] = {
    val out = new ArrayBuffer[Long]()
    var cx = 0; var cy = 0
    def move(pts: Array[(Int, Int)], from: Int, n: Int, cmd: Int): Unit = {
      out += ((cmd & 0x7) | (n << 3)).toLong
      var i = from
      while (i < from + n) {
        out += zigzag(pts(i)._1 - cx); out += zigzag(pts(i)._2 - cy)
        cx = pts(i)._1; cy = pts(i)._2
        i += 1
      }
    }
    // Degenerate parts are DROPPED, never emitted: MVT 2.1 §4.3.2 forbids
    // command count 0, and a 1-point ring would emit a negative LineTo
    // count whose varint encoding corrupts the wire for conformant
    // readers. (The reference MVT writer skips degenerate parts too.)
    g match {
      case TPoints(pts) =>
        if (pts.nonEmpty) move(pts, 0, pts.length, CmdMoveTo)
      case TLines(parts) =>
        parts.filter(_.length >= 2).foreach { p =>
          move(p, 0, 1, CmdMoveTo)
          move(p, 1, p.length - 1, CmdLineTo)
        }
      case TPolys(rings) =>
        // closing vertex implied (spec §4.3.3.3) — drop the last point;
        // a valid ring then needs ≥ 3 remaining points
        rings.filter(_.length - 1 >= 3).foreach { r =>
          val n = r.length - 1
          move(r, 0, 1, CmdMoveTo)
          move(r, 1, n - 1, CmdLineTo)
          out += CmdClosePath.toLong | (1L << 3)
        }
    }
    out.toArray
  }

  private def encodeValue(v: Value): Array[Byte] = {
    val w = new W
    v match {
      case VString(s) => w.stringField(1, s)
      case VDouble(d) => w.doubleField(3, d)
      case VLong(l) => w.varintField(4, l)
      case VBool(b) => w.varintField(7, if (b) 1 else 0)
    }
    w.result
  }

  def encodeTile(layers: Seq[Layer]): Array[Byte] = {
    val tile = new W
    layers.foreach { layer =>
      val lw = new W
      lw.varintField(15, 2) // version
      lw.stringField(1, layer.name)
      // first-appearance key/value dedup (reference writer maps)
      val keys = new LinkedHashMap[String, Int]()
      val values = new LinkedHashMap[Value, Int]()
      layer.features.foreach { f =>
        val fw = new W
        fw.varintField(1, f.id)
        if (f.tags.nonEmpty) {
          val tagsW = new W
          f.tags.foreach { case (k, v) =>
            tagsW.varint(keys.getOrElseUpdate(k, keys.size).toLong)
            tagsW.varint(values.getOrElseUpdate(v, values.size).toLong)
          }
          fw.bytesField(2, tagsW.result)
        }
        fw.varintField(3, f.geom.geomType.toLong)
        val gw = new W
        geomCommands(f.geom).foreach(gw.varint)
        fw.bytesField(4, gw.result)
        lw.bytesField(2, fw.result)
      }
      keys.keys.foreach(k => lw.stringField(3, k))
      values.keys.foreach(v => lw.bytesField(4, encodeValue(v)))
      lw.varintField(5, layer.extent.toLong)
      tile.bytesField(3, lw.result)
    }
    tile.result
  }

  // --------------------------------------------------------------- decode

  final case class DecodedFeature(id: Long, geomType: Int,
                                  parts: Array[Array[(Int, Int)]],
                                  tags: Seq[(String, Value)])
  final case class DecodedLayer(name: String, version: Int, extent: Int,
                                features: Seq[DecodedFeature])

  private final class R(b: Array[Byte], var pos: Int, val end: Int) {
    def varint(): Long = {
      var v = 0L; var shift = 0
      var more = true
      while (more) {
        val x = b(pos) & 0xff; pos += 1
        v |= (x & 0x7fL) << shift; shift += 7
        more = (x & 0x80) != 0
      }
      v
    }
    def fixed64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (b(pos) & 0xffL) << (8 * i); pos += 1; i += 1 }
      v
    }
    def fixed32(): Int = {
      var v = 0; var i = 0
      while (i < 4) { v |= (b(pos) & 0xff) << (8 * i); pos += 1; i += 1 }
      v
    }
    def sub(): R = { val len = varint().toInt; val r = new R(b, pos, pos + len); pos += len; r }
    def str(): String = { val len = varint().toInt; val s = new String(b, pos, len, "UTF-8"); pos += len; s }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => pos += varint().toInt
      case 5 => pos += 4
      case _ => throw new IllegalArgumentException(s"wire $wire")
    }
    def hasMore: Boolean = pos < end
  }

  private def decodeValue(r: R): Value = {
    var out: Value = VString("")
    while (r.hasMore) {
      val tag = r.varint(); val field = (tag >> 3).toInt; val wire = (tag & 7).toInt
      field match {
        case 1 => out = VString(r.str())
        case 2 => out = VDouble(java.lang.Float.intBitsToFloat(r.fixed32()).toDouble)
        case 3 => out = VDouble(java.lang.Double.longBitsToDouble(r.fixed64()))
        case 4 => out = VLong(r.varint())
        case 5 => out = VLong(r.varint())
        case 6 => out = VLong(unzigzag(r.varint()))
        case 7 => out = VBool(r.varint() != 0)
        case _ => r.skip(wire)
      }
    }
    out
  }

  private def decodeGeometry(cmds: Array[Long], geomType: Int): Array[Array[(Int, Int)]] = {
    val parts = new ArrayBuffer[Array[(Int, Int)]]()
    var cur = new ArrayBuffer[(Int, Int)]()
    var cx = 0; var cy = 0
    var i = 0
    while (i < cmds.length) {
      val cmd = (cmds(i) & 0x7).toInt; val count = (cmds(i) >> 3).toInt
      i += 1
      cmd match {
        case CmdMoveTo =>
          if (geomType != GeomPoint && cur.nonEmpty) { parts += cur.toArray; cur = new ArrayBuffer }
          var k = 0
          while (k < count) {
            cx += unzigzag(cmds(i)).toInt; cy += unzigzag(cmds(i + 1)).toInt
            i += 2; cur += ((cx, cy)); k += 1
          }
        case CmdLineTo =>
          var k = 0
          while (k < count) {
            cx += unzigzag(cmds(i)).toInt; cy += unzigzag(cmds(i + 1)).toInt
            i += 2; cur += ((cx, cy)); k += 1
          }
        case CmdClosePath =>
          // re-materialize the implied closing vertex
          if (cur.nonEmpty) cur += cur.head
          parts += cur.toArray; cur = new ArrayBuffer
        case other => throw new IllegalArgumentException(s"cmd $other")
      }
    }
    if (cur.nonEmpty) parts += cur.toArray
    parts.toArray
  }

  def decodeTile(bytes: Array[Byte]): Seq[DecodedLayer] = {
    val out = new ArrayBuffer[DecodedLayer]()
    val r = new R(bytes, 0, bytes.length)
    while (r.hasMore) {
      val tag = r.varint(); val field = (tag >> 3).toInt; val wire = (tag & 7).toInt
      if (field == 3 && wire == 2) {
        val lr = r.sub()
        var name = ""; var version = 1; var extent = DefaultExtent
        val keys = new ArrayBuffer[String]()
        val values = new ArrayBuffer[Value]()
        final case class RawF(id: Long, gt: Int, tags: Array[Long], cmds: Array[Long])
        val raw = new ArrayBuffer[RawF]()
        while (lr.hasMore) {
          val t2 = lr.varint(); val f2 = (t2 >> 3).toInt; val w2 = (t2 & 7).toInt
          f2 match {
            case 15 => version = lr.varint().toInt
            case 1 => name = lr.str()
            case 5 => extent = lr.varint().toInt
            case 3 => keys += lr.str()
            case 4 => values += decodeValue(lr.sub())
            case 2 =>
              val fr = lr.sub()
              var id = 0L; var gt = 0
              var tags = Array.empty[Long]; var cmds = Array.empty[Long]
              while (fr.hasMore) {
                val t3 = fr.varint(); val f3 = (t3 >> 3).toInt; val w3 = (t3 & 7).toInt
                f3 match {
                  case 1 => id = fr.varint()
                  case 3 => gt = fr.varint().toInt
                  case 2 =>
                    val pr = fr.sub()
                    val b = new ArrayBuffer[Long]()
                    while (pr.hasMore) b += pr.varint()
                    tags = b.toArray
                  case 4 =>
                    val pr = fr.sub()
                    val b = new ArrayBuffer[Long]()
                    while (pr.hasMore) b += pr.varint()
                    cmds = b.toArray
                  case _ => fr.skip(w3)
                }
              }
              raw += RawF(id, gt, tags, cmds)
            case _ => lr.skip(w2)
          }
        }
        val feats = raw.map { f =>
          val tags = f.tags.grouped(2).collect {
            case Array(k, v) if k < keys.length && v < values.length =>
              (keys(k.toInt), values(v.toInt))
          }.toSeq
          DecodedFeature(f.id, f.gt, decodeGeometry(f.cmds, f.gt), tags)
        }
        out += DecodedLayer(name, version, extent, feats.toSeq)
      } else r.skip(wire)
    }
    out.toSeq
  }
}
