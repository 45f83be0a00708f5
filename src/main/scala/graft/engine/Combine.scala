package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.geom._

/** `gdal vector combine` (reference: apps/gdalalg_vector_combine.cpp):
  * group features by attribute fields and COLLECT their geometries into one
  * collection feature per group — no geometric union (contrast [[Dissolve]]).
  *
  * Reference semantics mirrored here:
  *  - Output geometry type (gdalalg_vector_combine.cpp:212-234): the
  *    collection type of the source layer's declared type when that type is
  *    a specific single-part type (POINT→MULTIPOINT, LINESTRING→
  *    MULTILINESTRING, POLYGON→MULTIPOLYGON), else GEOMETRYCOLLECTION.
  *  - Flattening (combine.cpp:440-461): with keepNested=false (default) a
  *    source feature that is itself a collection contributes its COMPONENTS;
  *    with keepNested=true the whole geometry is nested, and if any nested
  *    source is a collection while the destination type is a typed
  *    collection, the destination is promoted to GEOMETRYCOLLECTION
  *    (combine.cpp:430-434 SetTypeGeometryCollection — the feature defn is
  *    shared, so the promotion is GLOBAL, which is what we compute).
  *  - Null/empty source geometries are skipped (combine.cpp:405).
  *  - add-extra-fields (combine.cpp:105-146): a non-group field is copied to
  *    the output when its values are identical within each group
  *    (COUNT(DISTINCT COALESCE(f,'__NULL__')) == 1 per group);
  *    "always_identical" keeps the field only if identical in ALL groups
  *    (MIN over groups), "sometimes_identical" if identical in AT LEAST ONE
  *    group (MAX over groups). A kept field's value is NULL for groups where
  *    it is not identical (combine.cpp:389-393 srcUniqueValues reset).
  *
  * Spark shape: ONE groupBy shuffle carries (ordered member WKTs,
  * per-extra-field distinct-count + candidate value). The global decisions —
  * which extra fields survive, whether keepNested forces the
  * GEOMETRYCOLLECTION promotion — are a bounded second aggregate over the
  * (small) per-group result, exactly the reference's SQLite prepass. At
  * 100 TB the member lists are per-group-bounded the same way GDAL's
  * in-memory map is; the collect() is one row of booleans. */
object Combine {

  /** OGR_GT_GetCollection analog over WKT type names (ogr_core.h). */
  def collectionTypeOf(srcGeomType: String): String =
    srcGeomType.trim.toUpperCase match {
      case "POINT"      => "MULTIPOINT"
      case "LINESTRING" => "MULTILINESTRING"
      case "POLYGON"    => "MULTIPOLYGON"
      case _            => "GEOMETRYCOLLECTION" // unknown or already multi
    }

  private def isCollection(g: Geom): Boolean = g match {
    case _: MultiPoint | _: MultiLineString | _: MultiPolygon |
        _: GeometryCollection => true
    case _ => false
  }

  private def components(g: Geom): Array[Geom] = g match {
    case m: MultiPoint         => m.points.toArray[Geom]
    case m: MultiLineString    => m.lines.toArray[Geom]
    case m: MultiPolygon       => m.polys.toArray[Geom]
    case c: GeometryCollection => c.geoms
    case other                 => Array(other)
  }

  /** Assemble one group's members (already in source order) into the
    * destination collection's WKT. Throws on a component that does not fit
    * a typed destination — the reference's addGeometry failure path. */
  private[graft] def assemble(members: Seq[String], dstType: String,
                              keepNested: Boolean): String = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[Geom]
    members.foreach { w =>
      val g = Wkt.parse(w)
      if (!g.isEmpty) {
        if (!keepNested && isCollection(g)) parts ++= components(g)
        else parts += g
      }
    }
    val out: Geom = dstType match {
      case "MULTIPOINT" => MultiPoint(parts.map {
        case p: Point => p
        case other => throw new IllegalArgumentException(
          s"Failed to add geometry of type ${other.getClass.getSimpleName} to MULTIPOINT")
      }.toArray)
      case "MULTILINESTRING" => MultiLineString(parts.map {
        case l: LineString => l
        case other => throw new IllegalArgumentException(
          s"Failed to add geometry of type ${other.getClass.getSimpleName} to MULTILINESTRING")
      }.toArray)
      case "MULTIPOLYGON" => MultiPolygon(parts.map {
        case p: Polygon => p
        case other => throw new IllegalArgumentException(
          s"Failed to add geometry of type ${other.getClass.getSimpleName} to MULTIPOLYGON")
      }.toArray)
      case _ => GeometryCollection(parts.toArray)
    }
    Wkt.write(out)
  }

  /** Combine `df` grouped by `groupBy`; member geometries are read from WKT
    * column `wktCol` and ordered within each group by `orderCol` (the FID —
    * the reference appends in scan order; a declared order is the
    * deterministic distributed analog). Returns one row per group with the
    * group-by columns, surviving extra fields, and `geometry_wkt`. */
  def combine(df: DataFrame, groupBy: Seq[String], orderCol: String,
              wktCol: String, srcGeomType: String = "",
              keepNested: Boolean = false, addExtraFields: String = "no",
              extraFields: Seq[String] = Nil): DataFrame = {
    require(groupBy.nonEmpty, "group-by fields required")
    val candidates = if (addExtraFields == "no") Nil else extraFields

    // one shuffle: ordered members + per-group extra-field identity
    val memberStruct = struct(col(orderCol).cast("long").as("o"),
      col(wktCol).as("w"))
    val aggs =
      sort_array(collect_list(memberStruct)).as("members") +:
      // EMPTY members are skipped by assemble() below, so they must not
      // vote for the keepNested GEOMETRYCOLLECTION promotion either — the
      // reference skips null/empty features BEFORE its type check
      // (gdalalg_vector_combine semantics)
      max(col(wktCol).rlike("^\\s*(MULTI|GEOMETRYCOLLECTION)") &&
        !col(wktCol).rlike("EMPTY\\s*$")).as("any_coll") +:
      candidates.flatMap { f => Seq(
        (count_distinct(coalesce(col(f).cast("string"), lit("__NULL__"))) === 1)
          .as(s"${f}__ident"),
        min(col(f)).as(s"${f}__val"))
      }
    val grouped = df.groupBy(groupBy.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

    // bounded global decision pass (one row): which fields survive, and
    // whether keepNested promotes the destination type
    val decisionAggs = max(col("any_coll")).as("any_coll") +:
      candidates.map { f =>
        val id = col(s"${f}__ident")
        (if (addExtraFields == "always_identical") min(id) else max(id))
          .as(s"${f}__keep")
      }
    val decision = grouped.agg(decisionAggs.head, decisionAggs.tail: _*)
      .collect()(0)
    val anyColl = Option(decision.getAs[Any]("any_coll"))
      .exists(_ == true)
    val kept = candidates.filter(f => decision.getAs[Boolean](s"${f}__keep"))

    val typed = collectionTypeOf(srcGeomType)
    val dstType =
      if (keepNested && anyColl && typed != "GEOMETRYCOLLECTION")
        "GEOMETRYCOLLECTION"
      else typed

    val asm = udf((members: Seq[String]) => assemble(members, dstType, keepNested))
    val outCols =
      groupBy.map(col) ++
      kept.map(f => when(col(s"${f}__ident"), col(s"${f}__val")).as(f)) :+
      asm(transform(col("members"), m => m.getField("w"))).as("geometry_wkt")
    grouped.select(outCols: _*)
  }
}
