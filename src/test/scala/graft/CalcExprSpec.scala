package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.CalcExpr

/** gdal raster calc formula parser (muparser arithmetic subset). */
class CalcExprSpec extends AnyFunSuite {

  private def ev(formula: String, vals: Double*): Double =
    CalcExpr.compile(formula, Seq("A", "B", "C").take(vals.length))(vals.toArray)

  test("precedence, associativity, unary minus, power right-assoc") {
    assert(ev("A + B * C", 1, 2, 3) === 7.0)
    assert(ev("(A + B) * C", 1, 2, 3) === 9.0)
    assert(ev("A - B - C", 10, 3, 2) === 5.0) // left-assoc
    assert(ev("A / B / C", 12, 3, 2) === 2.0)
    assert(ev("-A + B", 3, 5) === 2.0)
    assert(ev("-A ^ 2", 3) === -9.0) // unary binds the power result like muparser -x^2
    assert(ev("A ^ B ^ C", 2, 1, 3) === 2.0) // right-assoc: 2^(1^3)
    assert(ev("2 ^ 3 ^ 2") === 512.0)
  }

  test("functions incl. n-ary min/max/sum/mean; literals with exponents") {
    assert(ev("sqrt(A)", 16) === 4.0)
    assert(ev("abs(A - B)", 2, 7) === 5.0)
    assert(ev("min(A, B, C)", 4, 2, 9) === 2.0)
    assert(ev("max(A, B, C)", 4, 2, 9) === 9.0)
    assert(ev("sum(A, B, C)", 1, 2, 3) === 6.0)
    assert(ev("mean(A, B, C)", 3, 6, 9) === 6.0)
    assert(ev("pow(A, 3)", 2) === 8.0)
    assert(ev("log10(A)", 1000) === 3.0)
    assert(ev("1.5e2 + A", 50) === 200.0)
    assert(ev("2.5e-1 * A", 4) === 1.0)
  }

  test("the autotest formula shape (A+B)/(A-B+3)") {
    assert(ev("(A+B) / (A - B + 3)", 7, 4) === 11.0 / 6.0)
  }

  test("errors: unknown band, unknown function, trailing input") {
    intercept[IllegalArgumentException](ev("A + D", 1, 2))
    intercept[IllegalArgumentException](ev("frobnicate(A)", 1))
    intercept[IllegalArgumentException](ev("A + B )", 1, 2))
    intercept[IllegalArgumentException](ev("A +", 1))
  }
}
