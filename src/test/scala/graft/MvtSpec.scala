package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Mvt
import graft.engine.Mvt._

/** MVT 2.1 codec: the spec's §4.3 worked command examples as golden
  * vectors, full tile round-trips, key/value dedup, value types. */
class MvtSpec extends AnyFunSuite {

  test("spec §4.3.5.1: Point(25,17) encodes [9, 50, 34]") {
    assert(Mvt.commands(TPoints(Array((25, 17)))).toSeq === Seq(9L, 50L, 34L))
  }

  test("spec §4.3.5.2: MultiPoint (5,7),(3,2) encodes [17, 10, 14, 3, 9]") {
    assert(Mvt.commands(TPoints(Array((5, 7), (3, 2)))).toSeq ===
      Seq(17L, 10L, 14L, 3L, 9L))
  }

  test("spec §4.3.5.3: LineString (2,2),(2,10),(10,10) encodes [9,4,4,18,0,16,16,0]") {
    assert(Mvt.commands(TLines(Array(Array((2, 2), (2, 10), (10, 10))))).toSeq ===
      Seq(9L, 4L, 4L, 18L, 0L, 16L, 16L, 0L))
  }

  test("spec §4.3.5.5: Polygon (3,6),(8,12),(20,34) encodes [9,6,12,18,10,12,24,44,15]") {
    val ring = Array((3, 6), (8, 12), (20, 34), (3, 6)) // closing vertex present
    assert(Mvt.commands(TPolys(Array(ring))).toSeq ===
      Seq(9L, 6L, 12L, 18L, 10L, 12L, 24L, 44L, 15L))
  }

  test("multilinestring shares one cursor across parts (spec §4.3.5.4)") {
    val parts = Array(Array((2, 2), (2, 10)), Array((1, 1), (3, 5)))
    assert(Mvt.commands(TLines(parts)).toSeq ===
      Seq(9L, 4L, 4L, 10L, 0L, 16L, 9L, 1L, 17L, 10L, 4L, 8L))
  }

  test("full tile round-trip: layers, features, tags, geometry, extent") {
    val layer = Layer("docs", 4096, Seq(
      Feature(7, TPoints(Array((100, 200))),
        Seq("name" -> VString("a"), "score" -> VDouble(1.5), "n" -> VLong(42),
          "ok" -> VBool(true))),
      Feature(8, TLines(Array(Array((0, 0), (10, 0), (10, 10)))),
        Seq("name" -> VString("b"), "n" -> VLong(42))), // dedup: same key+value
      Feature(9, TPolys(Array(Array((0, 0), (100, 0), (100, 100), (0, 0)))), Nil)))
    val bytes = Mvt.encodeTile(Seq(layer))
    val dec = Mvt.decodeTile(bytes)
    assert(dec.length === 1)
    val l = dec.head
    assert(l.name === "docs" && l.version === 2 && l.extent === 4096)
    assert(l.features.length === 3)
    val f7 = l.features.find(_.id == 7).get
    assert(f7.geomType === GeomPoint)
    assert(f7.parts.head.toSeq === Seq((100, 200)))
    assert(f7.tags === Seq("name" -> VString("a"), "score" -> VDouble(1.5),
      "n" -> VLong(42), "ok" -> VBool(true)))
    val f8 = l.features.find(_.id == 8).get
    assert(f8.geomType === GeomLineString)
    assert(f8.parts.head.toSeq === Seq((0, 0), (10, 0), (10, 10)))
    assert(f8.tags === Seq("name" -> VString("b"), "n" -> VLong(42)))
    val f9 = l.features.find(_.id == 9).get
    assert(f9.geomType === GeomPolygon)
    // decoder re-materializes the implied closing vertex
    assert(f9.parts.head.toSeq === Seq((0, 0), (100, 0), (100, 100), (0, 0)))
  }

  test("key/value tables are deduplicated in first-appearance order") {
    val layer = Layer("l", 4096, Seq(
      Feature(1, TPoints(Array((1, 1))), Seq("k" -> VLong(5), "k2" -> VLong(5))),
      Feature(2, TPoints(Array((2, 2))), Seq("k" -> VLong(5)))))
    val bytes = Mvt.encodeTile(Seq(layer))
    // "k" and the value 5 appear once each in the wire tables: count the
    // key field (3) occurrences via decode fidelity + byte-level scan
    val dec = Mvt.decodeTile(bytes)
    assert(dec.head.features.flatMap(_.tags).toSet ===
      Set("k" -> VLong(5), "k2" -> VLong(5)))
    val s = new String(bytes, "ISO-8859-1")
    assert(s.sliding(2).count(_ == "k2") === 1)
  }

  test("negative coordinates zigzag correctly") {
    val c = Mvt.commands(TPoints(Array((-5, -3))))
    assert(c.toSeq === Seq(9L, 9L, 5L)) // zigzag(-5)=9, zigzag(-3)=5
    val rt = Mvt.decodeTile(Mvt.encodeTile(Seq(Layer("l", 4096,
      Seq(Feature(1, TPoints(Array((-5, -3))), Nil))))))
    assert(rt.head.features.head.parts.head.toSeq === Seq((-5, -3)))
  }

  test("multipolygon: two rings, cursor carries over, both closed on decode") {
    val rings = Array(
      Array((0, 0), (10, 0), (10, 10), (0, 0)),
      Array((11, 11), (20, 11), (20, 20), (11, 11)))
    val rt = Mvt.decodeTile(Mvt.encodeTile(Seq(Layer("l", 4096,
      Seq(Feature(1, TPolys(rings), Nil))))))
    val parts = rt.head.features.head.parts
    assert(parts.length === 2)
    assert(parts(0).toSeq === rings(0).toSeq)
    assert(parts(1).toSeq === rings(1).toSeq)
  }
}
