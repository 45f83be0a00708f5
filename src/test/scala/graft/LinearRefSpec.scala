package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.LinearRef

/** Linear-referencing kernels vs hand-checked cases (ogrlineref family;
  * Value/getSubLine ports of ogrlinestring.cpp:2119,2237, Project per the
  * GEOS LengthIndexedLine contract). */
class LinearRefSpec extends AnyFunSuite {

  // L-shaped line: (0,0)→(4,0)→(4,3), length 7
  private val L = Array(0.0, 0.0, 4.0, 0.0, 4.0, 3.0)

  test("project: interior, clamped-before, clamped-after, corner tie") {
    assert(LinearRef.project(L, 2.0, 1.0) == ((2.0, 1.0)))
    assert(LinearRef.project(L, -3.0, -4.0) == ((0.0, 25.0))) // clamp to start
    assert(LinearRef.project(L, 9.0, 3.0) == ((7.0, 25.0)))   // clamp to end
    // equidistant to both segments at the inside corner: first strict min
    // keeps segment 0's projection (station 4), not segment 1's
    val (st, d2) = LinearRef.project(L, 3.0, 1.0)
    assert(st == 3.0 && d2 == 1.0)
    // (5,1) projects inside segment 1 (d2 1 < the corner's 2): station 5
    val (stC, d2C) = LinearRef.project(L, 5.0, 1.0)
    assert(stC == 5.0 && d2C == 1.0)
  }

  test("value: negative clamps to start, beyond length to end, interior interpolates") {
    assert(LinearRef.value(L, -1.0) == ((0.0, 0.0)))
    assert(LinearRef.value(L, 99.0) == ((4.0, 3.0)))
    assert(LinearRef.value(L, 2.0) == ((2.0, 0.0)))
    assert(LinearRef.value(L, 5.5) == ((4.0, 1.5)))
  }

  test("subLine: same-segment early exit yields exactly 2 points") {
    val sub = LinearRef.subLine(L, 1.0, 3.0).get
    assert(sub.sameElements(Array(1.0, 0.0, 3.0, 0.0)))
  }

  test("subLine: spanning the corner carries the interior vertex") {
    val sub = LinearRef.subLine(L, 1.5, 5.5).get
    assert(sub.sameElements(Array(1.5, 0.0, 4.0, 0.0, 4.0, 1.5)))
  }

  test("subLine: from==0 duplicates the start vertex (reference quirk, getSubLine walk)") {
    val sub = LinearRef.subLine(L, 0.0, 5.0).get
    assert(sub.take(4).sameElements(Array(0.0, 0.0, 0.0, 0.0)))
  }

  test("subLine: asRatio scales by length; invalid ranges are None") {
    val sub = LinearRef.subLine(L, 0.5, 1.0, asRatio = true).get
    assert(sub(0) == 3.5 && sub(1) == 0.0) // station 3.5 on the first leg
    assert(LinearRef.subLine(L, 5.0, 2.0).isEmpty)  // from > to
    assert(LinearRef.subLine(L, 7.0, 9.0).isEmpty)  // from >= length
  }

  test("mileposts step along the line from the begin station") {
    val mp = LinearRef.mileposts(L, 2.0)
    assert(mp.map(_._1) == Seq(0.0, 2.0, 4.0, 6.0))
    assert(mp(2) == ((4.0, 4.0, 0.0)))
    assert(mp(3) == ((6.0, 4.0, 2.0)))
  }
}
