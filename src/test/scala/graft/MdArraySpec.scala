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
}
