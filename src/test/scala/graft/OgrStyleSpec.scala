package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.OgrStyle
import graft.geom.OgrStyle.StyleTable

/** OGR_STYLE parser + style table — replays autotest/ogr/ogr_style.py's
  * StyleTable sequence and the C++ style_manager unit conversion case. */
class OgrStyleSpec extends AnyFunSuite {

  test("StyleTable: add/find/save/load/modify (ogr_style.py sequence)") {
    val style = """SYMBOL(id:"http://style1_normal",c:#67452301)"""
    val t1 = StyleTable.empty.add("style1_normal", style).get
    // duplicate add refused (AddStyle contract)
    assert(t1.add("STYLE1_NORMAL", "PEN(c:#000000)").isEmpty)
    assert(t1.find("non_existing_style").isEmpty)
    assert(t1.find("style1_normal").contains(style))
    // save → load round-trip (the ':' inside the style survives: first-':' split)
    val t2 = StyleTable.parse(t1.serialize)
    assert(t2.find("style1_normal").contains(style))
    // modify upserts
    val t3 = t2.modify("style1_normal", "PEN(c:#FF0000,w:5px)")
    assert(t3.find("style1_normal").contains("PEN(c:#FF0000,w:5px)"))
    assert(t3.entries.length === 1)
    val t4 = t3.modify("new_style", "BRUSH(fc:#0000FF)")
    assert(t4.entries.length === 2)
    assert(t4.remove("new_style").entries.length === 1)
  }

  test("@name feature styles resolve through the table") {
    val table = StyleTable.empty.add("my_style", "PEN(c:#FF0000,w:5px)").get
    val resolved = OgrStyle.resolveStyle("@my_style", table)
    assert(resolved === "PEN(c:#FF0000,w:5px)")
    assert(OgrStyle.partCount(resolved) === 1)
    assert(OgrStyle.param(resolved, 0, "w") === "5")
    assert(OgrStyle.resolveStyle("@missing", table) === null)
    assert(OgrStyle.resolveStyle("PEN(c:#000000)", table) === "PEN(c:#000000)")
  }

  test("pen width unit conversion matches test_ogr.cpp:538 exactly") {
    val s = """PEN(w:2px,c:#000000,id:"mapinfo-pen-2,ogr-pen-0")"""
    // GetParamDbl with the default mm unit: 2/(72·39.37)·1000
    val mm = OgrStyle.paramDbl(s, 0, "w", "mm")
    assert(math.abs(mm - 2.0 * (1.0 / (72.0 * 39.37)) * 1000.0) < 1e-6)
    // after SetUnit(pixel): exactly 2.0
    assert(math.abs(OgrStyle.paramDbl(s, 0, "w", "px") - 2.0) < 1e-12)
    // quoted id with comma preserved whole
    assert(OgrStyle.param(s, 0, "id") === "mapinfo-pen-2,ogr-pen-0")
  }
}
