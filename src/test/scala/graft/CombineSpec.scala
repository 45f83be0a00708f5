package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Combine

/** `gdal vector combine` semantics beyond the g55 gate: keep-nested
  * promotion to GEOMETRYCOLLECTION, sometimes_identical extra fields,
  * empty-geometry skip, and the typed-destination component error
  * (gdalalg_vector_combine.cpp:212-234, 389-393, 405, 430-461). */
class CombineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def src = Seq(
    // (fid, grp, seg, wkt)
    (1L, 1, "A", "POINT (0 1)"),
    (2L, 1, "A", "MULTIPOINT ((2 3),(4 5))"),
    (3L, 1, "A", "POINT EMPTY"),
    (4L, 2, "B", "POINT (9 9)"),
    (5L, 2, "C", "POINT (8 8)")
  ).toDF("fid", "grp", "seg", "wkt")

  test("flatten (default): components enter the typed collection in FID order") {
    val out = Combine.combine(src, Seq("grp"), "fid", "wkt",
        srcGeomType = "POINT")
      .orderBy("grp").collect()
    assert(out(0).getAs[String]("geometry_wkt") ===
      "MULTIPOINT ((0 1),(2 3),(4 5))") // empty fid=3 skipped
    assert(out(1).getAs[String]("geometry_wkt") === "MULTIPOINT ((9 9),(8 8))")
  }

  test("keep-nested promotes a typed destination to GEOMETRYCOLLECTION globally") {
    val out = Combine.combine(src, Seq("grp"), "fid", "wkt",
        srcGeomType = "POINT", keepNested = true)
      .orderBy("grp").collect()
    // the MULTIPOINT member in group 1 forces the SHARED defn's promotion,
    // so group 2 (points only) is a GEOMETRYCOLLECTION too
    assert(out(0).getAs[String]("geometry_wkt") ===
      "GEOMETRYCOLLECTION (POINT (0 1),MULTIPOINT ((2 3),(4 5)))")
    assert(out(1).getAs[String]("geometry_wkt") ===
      "GEOMETRYCOLLECTION (POINT (9 9),POINT (8 8))")
  }

  test("sometimes_identical keeps a field identical in at least one group, nulling the rest") {
    val out = Combine.combine(src, Seq("grp"), "fid", "wkt",
        srcGeomType = "POINT", addExtraFields = "sometimes_identical",
        extraFields = Seq("seg"))
      .orderBy("grp").collect()
    assert(out(0).getAs[String]("seg") === "A")    // identical in group 1
    assert(out(0).schema.fieldNames.contains("seg"))
    assert(out(1).isNullAt(out(1).fieldIndex("seg"))) // B vs C → cancelled
  }

  test("always_identical drops a field that differs in any group") {
    val out = Combine.combine(src, Seq("grp"), "fid", "wkt",
        srcGeomType = "POINT", addExtraFields = "always_identical",
        extraFields = Seq("seg"))
    assert(!out.schema.fieldNames.contains("seg"))
  }

  test("unknown source type and component mismatch") {
    assert(Combine.collectionTypeOf("LINESTRING") === "MULTILINESTRING")
    assert(Combine.collectionTypeOf("GEOMETRY") === "GEOMETRYCOLLECTION")
    // a linestring cannot enter a MULTIPOINT destination (reference
    // addGeometry failure, combine.cpp:442-453)
    intercept[IllegalArgumentException] {
      Combine.assemble(Seq("LINESTRING (0 0,1 1)"), "MULTIPOINT",
        keepNested = false)
    }
    // all-empty group yields the typed EMPTY collection
    assert(Combine.assemble(Seq("POINT EMPTY"), "MULTIPOINT",
      keepNested = false) === "MULTIPOINT EMPTY")
  }
}
