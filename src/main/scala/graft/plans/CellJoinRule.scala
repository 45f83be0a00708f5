package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.graft.{StCell, StContainsPoint, StCover, StIntersectsPoint}

/** Optimizer rule: rewrite a naive spatial-predicate join
  *
  *   points JOIN polys ON st_contains_point(polys.wkb, points.lon, points.lat)
  *
  * — which Spark can only plan as a nested-loop / cartesian join, O(n·m)
  * predicate evaluations — into the cell-indexed equi-join the engine's
  * SpatialJoin API builds by hand:
  *
  *   points + st_cell(lon,lat,z)  ⋈_cell  polys × explode(st_cover(wkb,z))
  *   … refined by the ORIGINAL predicate
  *
  * A point lands in exactly one cell, so no dedup is introduced. The
  * equi-join key lets Catalyst pick broadcast-hash or sort-merge (and AQE
  * handle skew) instead of a quadratic loop — at 100 TB this is the
  * difference between a plan that finishes and one that cannot.
  *
  * Reference analog: OGR's layer-algebra loop installs a spatial filter per
  * probe feature (ogrlayer.cpp:5385-5538) — its index-accelerated candidate
  * scan is exactly what this rewrite recovers declaratively.
  *
  * The rule fires only when the join condition IS the bare spatial
  * predicate (the rewritten plan carries the predicate under an And with
  * the cell equality, so it never re-fires). Zoom is configurable with
  * `spark.graft.celljoin.zoom` (default 4). Register at runtime through
  * `spark.experimental.extraOptimizations` (GraftFunctions.register) or at
  * build time via GraftExtensions. */
object CellJoinRule extends Rule[LogicalPlan] {

  private def zoom: Int =
    try SQLConf.get.getConfString("spark.graft.celljoin.zoom", "4").toInt
    catch { case _: Exception => 4 }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, jt @ (Inner | Cross), Some(pred), hint)
        if matchPredicate(pred, left, right).isDefined =>
      val (wkb, lon, lat, ptsLeft) = matchPredicate(pred, left, right).get
      val z = zoom
      val (ptsSide, polySide) = if (ptsLeft) (left, right) else (right, left)
      // points side: one cell per row
      val cellL = Alias(StCell(lon, lat, Literal(z)), "__graft_cell_pt")()
      val pts2 = Project(ptsSide.output :+ cellL, ptsSide)
      // polygon side: explode the cover
      val cellR = AttributeReference("__graft_cell_poly", LongType, nullable = false)()
      val polys2 = Generate(Explode(StCover(wkb, Literal(z))), Nil,
        outer = false, qualifier = None, generatorOutput = Seq(cellR), child = polySide)
      val cond = And(EqualTo(cellL.toAttribute, cellR), pred)
      val joined =
        if (ptsLeft) Join(pts2, polys2, Inner, Some(cond), hint)
        else Join(polys2, pts2, Inner, Some(cond), hint)
      Project(j.output, joined)
  }

  /** The condition must be exactly st_contains_point/st_intersects_point
    * with the wkb from one side and lon/lat from the other. Returns
    * (wkb, lon, lat, pointsAreLeft). */
  private def matchPredicate(pred: Expression, left: LogicalPlan,
                             right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    val (wkb, lon, lat) = pred match {
      case StContainsPoint(w, lo, la)   => (w, lo, la)
      case StIntersectsPoint(w, lo, la) => (w, lo, la)
      case _                            => return None
    }
    val lSet = left.outputSet; val rSet = right.outputSet
    val ptCols = lon.references ++ lat.references
    if (wkb.references.subsetOf(rSet) && ptCols.subsetOf(lSet) &&
        wkb.references.nonEmpty && ptCols.nonEmpty)
      Some((wkb, lon, lat, true))
    else if (wkb.references.subsetOf(lSet) && ptCols.subsetOf(rSet) &&
        wkb.references.nonEmpty && ptCols.nonEmpty)
      Some((wkb, lon, lat, false))
    else None
  }
}
