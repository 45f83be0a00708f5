package graft.geom

/** Ellipsoidal conic projections on WGS84: Lambert Conformal Conic (2SP)
  * and Albers Equal-Area (2SP), from Snyder, "Map Projections — A Working
  * Manual" (USGS PP 1395, 1987, public domain; LCC §15, Albers §14) — the
  * formulation PROJ's lcc/aea implement. Reference:
  * /root/reference/ogr/ogrct.cpp delegates all CRS math to PROJ; this
  * engine carries its projection set natively (3857 + UTM + these two —
  * the most common projected CRS families after Mercator).
  *
  * Parameters are the two standard parallels, origin latitude and central
  * meridian (degrees); false easting/northing 0 (callers add offsets).
  * Operation order is fixed so an SQL twin with identical literals is
  * numerically identical to ~ulp. */
object Conic {

  final val A = 6378137.0
  final val F = 1.0 / 298.257223563
  private val e2 = F * (2.0 - F)
  private val e = math.sqrt(e2)
  private val d2r = math.Pi / 180.0

  /** Snyder 14-15: m(φ) = cosφ / √(1 − e²sin²φ). */
  @inline private def mOf(phi: Double): Double = {
    val s = math.sin(phi)
    math.cos(phi) / math.sqrt(1.0 - e2 * s * s)
  }

  /** Snyder 15-9: t(φ) = tan(π/4 − φ/2) / ((1 − e sinφ)/(1 + e sinφ))^(e/2). */
  @inline private def tOf(phi: Double): Double = {
    val s = math.sin(phi)
    math.tan(math.Pi / 4.0 - phi / 2.0) /
      math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0)
  }

  /** Snyder 14-12 (q, used by Albers): */
  @inline private def qOf(phi: Double): Double = {
    val s = math.sin(phi)
    (1.0 - e2) * (s / (1.0 - e2 * s * s) -
      (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s)))
  }

  /** LCC 2SP constants for (lat1, lat2, lat0) in degrees. */
  final case class LccParams(n: Double, f: Double, rho0: Double, lam0: Double)

  def lccParams(lat1: Double, lat2: Double, lat0: Double, lon0: Double): LccParams = {
    val p1 = lat1 * d2r; val p2 = lat2 * d2r; val p0 = lat0 * d2r
    val m1 = mOf(p1); val m2 = mOf(p2)
    val t1 = tOf(p1); val t2 = tOf(p2); val t0 = tOf(p0)
    val n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    val ff = m1 / (n * math.pow(t1, n))
    LccParams(n, ff, A * ff * math.pow(t0, n), lon0 * d2r)
  }

  /** LCC forward (Snyder 15-1..15-4): degrees → meters. */
  def lccForward(lonDeg: Double, latDeg: Double, p: LccParams): (Double, Double) = {
    val rho = A * p.f * math.pow(tOf(latDeg * d2r), p.n)
    val th = p.n * (lonDeg * d2r - p.lam0)
    (rho * math.sin(th), p.rho0 - rho * math.cos(th))
  }

  /** LCC inverse (Snyder 15-8..15-11); φ via the fixed-point of 7-9. */
  def lccInverse(x: Double, y: Double, p: LccParams): (Double, Double) = {
    val sgn = if (p.n >= 0) 1.0 else -1.0
    val rho = sgn * math.sqrt(x * x + (p.rho0 - y) * (p.rho0 - y))
    val th = math.atan2(sgn * x, sgn * (p.rho0 - y))
    val t = math.pow(rho / (A * p.f), 1.0 / p.n)
    var phi = math.Pi / 2.0 - 2.0 * math.atan(t)
    var i = 0
    while (i < 9) {
      val s = math.sin(phi)
      phi = math.Pi / 2.0 - 2.0 * math.atan(
        t * math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0))
      i += 1
    }
    ((th / p.n + p.lam0) / d2r, phi / d2r)
  }

  /** Albers 2SP constants. */
  final case class AlbersParams(n: Double, c: Double, rho0: Double, lam0: Double)

  def albersParams(lat1: Double, lat2: Double, lat0: Double, lon0: Double): AlbersParams = {
    val p1 = lat1 * d2r; val p2 = lat2 * d2r; val p0 = lat0 * d2r
    val m1 = mOf(p1); val m2 = mOf(p2)
    val q1 = qOf(p1); val q2 = qOf(p2); val q0 = qOf(p0)
    val n = (m1 * m1 - m2 * m2) / (q2 - q1)
    val c = m1 * m1 + n * q1
    AlbersParams(n, c, A * math.sqrt(c - n * q0) / n, lon0 * d2r)
  }

  /** Albers forward (Snyder 14-1..14-4). */
  def albersForward(lonDeg: Double, latDeg: Double, p: AlbersParams): (Double, Double) = {
    val rho = A * math.sqrt(p.c - p.n * qOf(latDeg * d2r)) / p.n
    val th = p.n * (lonDeg * d2r - p.lam0)
    (rho * math.sin(th), p.rho0 - rho * math.cos(th))
  }

  /** Albers inverse (Snyder 14-8..14-11; φ via iteration 3-16). */
  def albersInverse(x: Double, y: Double, p: AlbersParams): (Double, Double) = {
    val rho = math.sqrt(x * x + (p.rho0 - y) * (p.rho0 - y))
    val th = math.atan2(x, p.rho0 - y)
    val q = (p.c - (rho * p.n / A) * (rho * p.n / A)) / p.n
    var phi = math.asin(q / 2.0)
    var i = 0
    while (i < 10) {
      val s = math.sin(phi)
      val one = 1.0 - e2 * s * s
      phi += one * one / (2.0 * math.cos(phi)) * (
        q / (1.0 - e2) - s / one +
          (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s)))
      i += 1
    }
    ((th / p.n + p.lam0) / d2r, phi / d2r)
  }

  // ---- geometry-level transforms (WKB path goes through GeoKernel)

  def lccGeom(g: Geom, lat1: Double, lat2: Double, lat0: Double, lon0: Double): Geom = {
    val p = lccParams(lat1, lat2, lat0, lon0)
    GeoOps.mapCoords(g, (x, y) => lccForward(x, y, p))
  }
  def lccInvGeom(g: Geom, lat1: Double, lat2: Double, lat0: Double, lon0: Double): Geom = {
    val p = lccParams(lat1, lat2, lat0, lon0)
    GeoOps.mapCoords(g, (x, y) => lccInverse(x, y, p))
  }
  def albersGeom(g: Geom, lat1: Double, lat2: Double, lat0: Double, lon0: Double): Geom = {
    val p = albersParams(lat1, lat2, lat0, lon0)
    GeoOps.mapCoords(g, (x, y) => albersForward(x, y, p))
  }
  def albersInvGeom(g: Geom, lat1: Double, lat2: Double, lat0: Double, lon0: Double): Geom = {
    val p = albersParams(lat1, lat2, lat0, lon0)
    GeoOps.mapCoords(g, (x, y) => albersInverse(x, y, p))
  }
}
