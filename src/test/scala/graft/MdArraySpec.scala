package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.MdArray

/** MdArray lazy views vs a brute-force reference (GDALMDArray::GetView /
  * Transpose semantics, gcore/multidim/gdalmultidim_array_view.cpp:743-792).
  * The array is small enough to enumerate; shapes/chunks are deliberately
  * non-divisible so edge (partial) chunks are exercised everywhere. */
object MdArraySpec {
  // companion-level so the create() closure doesn't capture the (non-
  // serializable) suite instance
  def f(c: Array[Long]): Double =
    ((c(0) * 7919 + c(1) * 104729 + (if (c.length > 2) c(2) else 0L) * 6151) % 9973).toDouble
}

class MdArraySpec extends AnyFunSuite {
  import MdArraySpec.f

  private val s = SparkTestSession.spark

  private lazy val base = MdArray.create(s, Array(13L, 10L, 7L), Array(4, 4, 4))(MdArraySpec.f)

  private def dump(a: MdArray): Map[Seq[Long], Double] =
    a.toTable.collect().map { r =>
      val dims = (0 until a.shape.length).map(d => r.getLong(r.fieldIndex(s"d$d")))
      dims -> r.getDouble(r.fieldIndex("v"))
    }.toMap

  test("identity materialize roundtrips the generator") {
    val got = dump(base)
    assert(got.size === 13 * 10 * 7)
    assert(got(Seq(12L, 9L, 6L)) === f(Array(12L, 9L, 6L)))
    assert(got(Seq(0L, 0L, 0L)) === f(Array(0L, 0L, 0L)))
  }

  test("integer index drops a dim; slice with step; ellipsis") {
    val v = base.getView("[3, 1:9:3, ...]") // -> shape (3, 7)
    assert(v.shape.toSeq === Seq(3L, 7L))
    val got = dump(v)
    for (j <- 0 until 3; k <- 0 until 7)
      assert(got(Seq(j.toLong, k.toLong)) === f(Array(3L, 1L + 3 * j, k.toLong)),
        s"at ($j,$k)")
  }

  test("negative step reverses; negative indices count from the end") {
    val v = base.getView("[::-1, -2, 2:]") // -> shape (13, 5)
    assert(v.shape.toSeq === Seq(13L, 5L))
    val got = dump(v)
    for (i <- 0 until 13; k <- 0 until 5)
      assert(got(Seq(i.toLong, k.toLong)) === f(Array(12L - i, 8L, 2L + k)),
        s"at ($i,$k)")
  }

  test("newaxis inserts a size-1 dim") {
    val v = base.getView("[newaxis, 5, 5, ...]") // -> shape (1, 7)
    assert(v.shape.toSeq === Seq(1L, 7L))
    val got = dump(v)
    for (k <- 0 until 7)
      assert(got(Seq(0L, k.toLong)) === f(Array(5L, 5L, k.toLong)))
  }

  test("views compose with transpose lazily (no materialize between)") {
    val v = base.getView("[1:12:2, ...]").transpose(Array(2, 0, 1))
      .getView("[::2, :, 3:8]") // chain: slice -> transpose -> slice
    // dims: d0 = k in 0,2,4,6 ; d1 = i = 1+2a ; d2 = j in 3..7
    assert(v.shape.toSeq === Seq(4L, 6L, 5L))
    val got = dump(v)
    for (a <- 0 until 4; b <- 0 until 6; c <- 0 until 5)
      assert(got(Seq(a.toLong, b.toLong, c.toLong)) ===
        f(Array(1L + 2 * b, 3L + c, 2L * a)), s"at ($a,$b,$c)")
  }

  test("sum/max reductions match brute force, including across chunk seams") {
    val v = base.getView("[2:11, ...]") // shape (9, 10, 7), crosses chunks
    val summed = v.sumAxis(1) // shape (9, 7)
    val got = dump(summed)
    for (i <- 0 until 9; k <- 0 until 7) {
      val want = (0 until 10).map(j => f(Array(2L + i, j.toLong, k.toLong))).sum
      assert(got(Seq(i.toLong, k.toLong)) === want, s"sum at ($i,$k)")
    }
    val maxed = v.maxAxis(0).maxAxis(0) // shape (7)
    val gotM = dump(maxed)
    for (k <- 0 until 7) {
      val want = (for (i <- 2 until 11; j <- 0 until 10)
        yield f(Array(i.toLong, j.toLong, k.toLong))).max
      assert(gotM(Seq(k.toLong)) === want, s"max at $k")
    }
  }

  test("mapValues is elementwise; stats aggregate the whole array") {
    val v = base.getView("[0, 0, :]").mapValues(_ * 2.0 + 1.0)
    val got = dump(v)
    for (k <- 0 until 7)
      assert(got(Seq(k.toLong)) === f(Array(0L, 0L, k.toLong)) * 2.0 + 1.0)
    val st = base.stats.collect()(0)
    assert(st.getLong(st.fieldIndex("n")) === 13L * 10 * 7)
  }

  test("empty slice yields an empty table, not an error") {
    val v = base.getView("[5:5, ...]")
    assert(v.shape.toSeq === Seq(0L, 10L, 7L))
    assert(v.toTable.count() === 0L)
  }

  test("unscale: affine + nodata mapping; scale=1/offset=0 returns this exact array") {
    val a = MdArray.create(s, Array(11L), Array(4))(c =>
      if (c(0) == 5L) -1.0 else c(0).toDouble)
    assert(a.unscale(1.0, 0.0) eq a) // reference :435 short-circuit
    val u = a.unscale(3.0, 2.0, srcNodata = Some(-1.0), dstNodata = -7.0)
    val got = dump(u)
    for (k <- 0 until 11)
      assert(got(Seq(k.toLong)) === (if (k == 5) -7.0 else k * 3.0 + 2.0), s"k=$k")
    // NaN srcNodata matches NaN values (reference GetUnscaled NaN handling)
    val b = MdArray.create(s, Array(4L), Array(4))(c =>
      if (c(0) == 2L) Double.NaN else c(0).toDouble)
    val gb = dump(b.unscale(2.0, 0.0, srcNodata = Some(Double.NaN), dstNodata = -9.0))
    assert(gb(Seq(2L)) === -9.0 && gb(Seq(3L)) === 6.0)
  }

  test("meshgrid xy/ij shapes and broadcast values (NumPy/GetMeshGrid contract)") {
    val x = MdArray.create(s, Array(5L), Array(2))(c => c(0) * 10.0)
    val y = MdArray.create(s, Array(3L), Array(2))(c => c(0) * 100.0)
    val Seq(xm, ym) = MdArray.meshgrid(Seq(x, y), "xy")
    assert(xm.shape.toSeq === Seq(3L, 5L) && ym.shape.toSeq === Seq(3L, 5L))
    val gx = dump(xm); val gy = dump(ym)
    for (a <- 0 until 3; b <- 0 until 5) {
      assert(gx(Seq(a.toLong, b.toLong)) === b * 10.0, s"xy xm ($a,$b)")
      assert(gy(Seq(a.toLong, b.toLong)) === a * 100.0, s"xy ym ($a,$b)")
    }
    val Seq(xi, yi) = MdArray.meshgrid(Seq(x, y), "ij")
    assert(xi.shape.toSeq === Seq(5L, 3L) && yi.shape.toSeq === Seq(5L, 3L))
    val gxi = dump(xi); val gyi = dump(yi)
    for (a <- 0 until 5; b <- 0 until 3) {
      assert(gxi(Seq(a.toLong, b.toLong)) === a * 10.0, s"ij xm ($a,$b)")
      assert(gyi(Seq(a.toLong, b.toLong)) === b * 100.0, s"ij ym ($a,$b)")
    }
    // 3-array meshgrid: only dims 0/1 swap under xy (reference :76-78)
    val z = MdArray.create(s, Array(2L), Array(2))(c => c(0) * 1000.0)
    val m3 = MdArray.meshgrid(Seq(x, y, z), "xy")
    assert(m3.forall(_.shape.toSeq == Seq(3L, 5L, 2L)))
    assert(dump(m3(2))(Seq(1L, 2L, 1L)) === 1000.0)
    // view composition: a reversed input broadcasts reversed
    val Seq(xr, _) = MdArray.meshgrid(Seq(x.getView("[::-1]"), y), "xy")
    assert(dump(xr)(Seq(0L, 0L)) === 40.0)
  }

  test("gridded: frame formulas, lattice nodes, invdist values vs brute force") {
    val n = 60
    def lonF(k: Long) = ((k * 239) % 320) / 16.0   // [0, 20)
    def latF(k: Long) = ((k * 377) % 160) / 16.0   // [0, 10)
    def valF(k: Long) = ((k * 7) % 50) * 0.5
    val xa = MdArray.create(s, Array(n.toLong), Array(16))(c => lonF(c(0)))
    val ya = MdArray.create(s, Array(n.toLong), Array(16))(c => latF(c(0)))
    val va = MdArray.create(s, Array(n.toLong), Array(16))(c => valF(c(0)))
    val gr = va.gridded(xa, ya, radius = Some(2.5), minPoints = 1,
      nodata = -1.0, resolution = Some(1.0))
    val (minX, maxX) = ((0 until n).map(k => lonF(k)).min, (0 until n).map(k => lonF(k)).max)
    val (minY, maxY) = ((0 until n).map(k => latF(k)).min, (0 until n).map(k => latF(k)).max)
    val nX = math.max(2, (1 + math.floor((maxX - minX) / 1.0 + 1e-8)).toInt)
    val nY = math.max(2, (1 + math.floor((maxY - minY) / 1.0 + 1e-8)).toInt)
    assert(gr.arr.shape.toSeq === Seq(nY.toLong, nX.toLong))
    assert(gr.minX === minX && gr.minY === minY)
    assert(gr.resX === (maxX - minX) / (nX - 1) && gr.resY === (maxY - minY) / (nY - 1))
    val got = dump(gr.arr)
    for (j <- 0 until nY; i <- 0 until nX) {
      val (nlon, nlat) = (minX + i * gr.resX, minY + j * gr.resY)
      val cand = (0 until n).map { k =>
        val d2 = (lonF(k) - nlon) * (lonF(k) - nlon) + (latF(k) - nlat) * (latF(k) - nlat)
        (d2, valF(k))
      }.filter(_._1 <= 2.5 * 2.5)
      val want =
        if (cand.isEmpty) -1.0
        else cand.find(_._1 < 1e-13).map(_._2).getOrElse(
          cand.map { case (d2, v) => v * (1.0 / d2) }.sum /
            cand.map { case (d2, _) => 1.0 / d2 }.sum)
      val g = got(Seq(j.toLong, i.toLong))
      assert(math.abs(g - want) < 1e-9, s"node ($j,$i): got $g want $want")
    }
  }

  test("gridded: RESOLUTION guess matches the reference's two-stage formula") {
    val n = 40
    def lonF(k: Long) = (k % 8) * 2.0
    def latF(k: Long) = (k / 8) * 2.0
    val xa = MdArray.create(s, Array(n.toLong), Array(16))(c => lonF(c(0)))
    val ya = MdArray.create(s, Array(n.toLong), Array(16))(c => latF(c(0)))
    val va = MdArray.create(s, Array(n.toLong), Array(16))(c => c(0).toDouble)
    // brute-force the reference guess (gdalmultidim_array_gridded.cpp:710-755);
    // spans: x over [0,14] (k%8 · 2), y over [0,8] (k/8 · 2)
    val res0 = math.sqrt((8.0 - 0.0) * (14.0 - 0.0) / n)
    val mins = (0 until 10).flatMap { i =>
      val idx = i.toLong * n / 10
      val (sx, sy) = (lonF(idx), latF(idx))
      val ds = (0 until n).map { k =>
        val (dx, dy) = (lonF(k) - sx, latF(k) - sy)
        (dx, dy, dx * dx + dy * dy)
      }.filter { case (dx, dy, d2) =>
        math.abs(dx) <= 2 * res0 && math.abs(dy) <= 2 * res0 && d2 > 0 }
      if (ds.isEmpty) None else Some(ds.map(_._3).min)
    }
    val wantRes = if (mins.isEmpty) res0 else math.sqrt(mins.sum / mins.length)
    val gr = va.gridded(xa, ya, radius = Some(3.0), nodata = -1.0)
    val nXw = math.max(2, (1 + math.floor(14.0 / wantRes + 1e-8)).toInt)
    val nYw = math.max(2, (1 + math.floor(8.0 / wantRes + 1e-8)).toInt)
    assert(gr.arr.shape.toSeq === Seq(nYw.toLong, nXw.toLong),
      s"guessed frame ${gr.arr.shape.toSeq}, want ($nYw,$nXw) from res $wantRes")
  }

  test("gridded refuses non-rank-1 and mismatched lengths loudly") {
    val a2 = MdArray.create(s, Array(4L, 4L), Array(4, 4))(c => c(0).toDouble)
    val a1 = MdArray.create(s, Array(16L), Array(8))(c => c(0).toDouble)
    intercept[IllegalArgumentException] { a2.gridded(a1, a1) }
    val short = MdArray.create(s, Array(5L), Array(8))(c => c(0).toDouble)
    intercept[IllegalArgumentException] { a1.gridded(short, a1) }
    intercept[IllegalArgumentException] { a1.gridded(a1, a1, algorithm = "kriging") }
  }
}
