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

  // ---- Polar Stereographic, variant B (standard parallel), Snyder §21
  // (PROJ +proj=stere +lat_0=±90 +lat_ts=...; EPSG:3413/3031 family).

  /** rhoC = A·m(φ1)/t(φ1); south pole selected by lat_ts < 0. */
  final case class PsParams(rhoC: Double, lam0: Double, south: Boolean)

  def psParams(latTs: Double, lon0: Double): PsParams = {
    val p1 = math.abs(latTs) * d2r
    PsParams(A * mOf(p1) / tOf(p1), lon0 * d2r, latTs < 0.0)
  }

  /** Forward (Snyder 21-30/31 north aspect; south via φ,x,y negation). */
  def psForward(lonDeg: Double, latDeg: Double, p: PsParams): (Double, Double) = {
    val lam = lonDeg * d2r
    val phi = if (p.south) -(latDeg * d2r) else latDeg * d2r
    val rho = p.rhoC * tOf(phi)
    val th = if (p.south) -(lam - p.lam0) else lam - p.lam0
    val x = rho * math.sin(th)
    val y = -(rho * math.cos(th))
    if (p.south) (-x, -y) else (x, y)
  }

  /** Inverse (Snyder 21-39/40; φ via the fixed-point of 7-9). */
  def psInverse(x0: Double, y0: Double, p: PsParams): (Double, Double) = {
    val x = if (p.south) -x0 else x0
    val y = if (p.south) -y0 else y0
    val rho = math.sqrt(x * x + y * y)
    val t = rho / p.rhoC
    val th = math.atan2(x, -y)
    var phi = math.Pi / 2.0 - 2.0 * math.atan(t)
    var i = 0
    while (i < 9) {
      val s = math.sin(phi)
      phi = math.Pi / 2.0 - 2.0 * math.atan(
        t * math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0))
      i += 1
    }
    val lam0 = if (p.south) p.lam0 - th else p.lam0 + th
    // wrap to [-π, π): λ0 + atan2's branch can leave the principal range
    val lam = lam0 - 2.0 * math.Pi * math.floor((lam0 + math.Pi) / (2.0 * math.Pi))
    ((lam) / d2r, (if (p.south) -phi else phi) / d2r)
  }

  // ---- Sinusoidal, ellipsoidal (Snyder §30; PROJ +proj=sinu — the MODIS
  // grid projection). Equal-area, pseudocylindrical.

  final case class SinuParams(lam0: Double, m0: Double, m1: Double,
                              m2: Double, m3: Double, e1: Double)

  def sinuParams(lon0: Double): SinuParams = {
    val e4 = e2 * e2; val e6 = e4 * e2
    val m0 = A * (1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0)
    val m1 = A * (3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0)
    val m2 = A * (15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0)
    val m3 = A * (35.0 * e6 / 3072.0)
    val se = math.sqrt(1.0 - e2)
    SinuParams(lon0 * d2r, m0, m1, m2, m3, (1.0 - se) / (1.0 + se))
  }

  /** Forward (Snyder 30-8: x; 3-21: y = meridian distance M(φ)). */
  def sinuForward(lonDeg: Double, latDeg: Double, p: SinuParams): (Double, Double) = {
    val lam = lonDeg * d2r; val phi = latDeg * d2r
    val s = math.sin(phi)
    val x = A * (lam - p.lam0) * math.cos(phi) / math.sqrt(1.0 - e2 * s * s)
    val y = p.m0 * phi - p.m1 * math.sin(2.0 * phi) +
      p.m2 * math.sin(4.0 * phi) - p.m3 * math.sin(6.0 * phi)
    (x, y)
  }

  /** Inverse (footpoint series Snyder 3-26, then 30-11). */
  def sinuInverse(x: Double, y: Double, p: SinuParams): (Double, Double) = {
    val mu = y / p.m0
    val e1 = p.e1
    var phi = mu +
      (3.0 * e1 / 2.0 - 27.0 * e1 * e1 * e1 / 32.0) * math.sin(2.0 * mu) +
      (21.0 * e1 * e1 / 16.0 - 55.0 * e1 * e1 * e1 * e1 / 32.0) * math.sin(4.0 * mu) +
      (151.0 * e1 * e1 * e1 / 96.0) * math.sin(6.0 * mu) +
      (1097.0 * e1 * e1 * e1 * e1 / 512.0) * math.sin(8.0 * mu)
    // the series truncates at ~1e-9 rad near the poles; two Newton steps
    // on M(φ) = y (M' = meridian radius) land at machine precision
    var k = 0
    while (k < 2) {
      val sk = math.sin(phi)
      val mPhi = p.m0 * phi - p.m1 * math.sin(2.0 * phi) +
        p.m2 * math.sin(4.0 * phi) - p.m3 * math.sin(6.0 * phi)
      val onek = 1.0 - e2 * sk * sk
      phi += (y - mPhi) * math.pow(onek, 1.5) / (A * (1.0 - e2))
      k += 1
    }
    val s = math.sin(phi)
    val lam =
      if (math.abs(math.cos(phi)) < 1e-12) p.lam0
      else p.lam0 + x * math.sqrt(1.0 - e2 * s * s) / (A * math.cos(phi))
    (lam / d2r, phi / d2r)
  }

  // ---- Azimuthal Equidistant, spherical oblique form (Snyder §25
  // 25-1..25-4, 25-15..25-18; PROJ aeqd with the ellipsoid collapsed to
  // the semi-major sphere, +R=a). Polar research grids / "distance from
  // here" maps. Ellipsoidal aeqd (geodesic-based) is documented out.

  /** Forward: k' = c / sin c around (lat0, lon0). (Near-)antipodal points
    * (c within ~1e-7 of π) are a projection error — PROJ's aeqd fails the
    * "tolerance condition" there and Snyder leaves the antipode undefined
    * (k' → ∞) — so they map to (NaN, NaN) instead of the astronomically
    * large finite coordinates c/sin(c) would otherwise produce. */
  def aeqdForward(lonDeg: Double, latDeg: Double, lat0Deg: Double,
                  lon0Deg: Double): (Double, Double) = {
    val phi = latDeg * d2r; val lam = lonDeg * d2r
    val phi0 = lat0Deg * d2r; val lam0 = lon0Deg * d2r
    val cosC = math.sin(phi0) * math.sin(phi) +
      math.cos(phi0) * math.cos(phi) * math.cos(lam - lam0)
    val c = math.acos(math.max(-1.0, math.min(1.0, cosC)))
    if (math.Pi - c < 1e-7) return (Double.NaN, Double.NaN)
    val kp = if (c == 0.0) 1.0 else c / math.sin(c)
    val x = A * kp * math.cos(phi) * math.sin(lam - lam0)
    val y = A * kp * (math.cos(phi0) * math.sin(phi) -
      math.sin(phi0) * math.cos(phi) * math.cos(lam - lam0))
    (x, y)
  }

  /** Inverse (Snyder 25-15): c = rho/R; center maps to itself. */
  def aeqdInverse(x: Double, y: Double, lat0Deg: Double,
                  lon0Deg: Double): (Double, Double) = {
    val phi0 = lat0Deg * d2r; val lam0 = lon0Deg * d2r
    val rho = math.sqrt(x * x + y * y)
    if (rho == 0.0) return (lon0Deg, lat0Deg)
    val c = rho / A
    val sinC = math.sin(c); val cosC = math.cos(c)
    val phi = math.asin(math.max(-1.0, math.min(1.0,
      cosC * math.sin(phi0) + y * sinC * math.cos(phi0) / rho)))
    val lam = lam0 + math.atan2(x * sinC,
      rho * math.cos(phi0) * cosC - y * math.sin(phi0) * sinC)
    // PROJ adjlon wrap to (-180, 180]
    val lonDeg = lam / d2r
    val wrapped = if (lonDeg > 180.0) lonDeg - 360.0
      else if (lonDeg <= -180.0) lonDeg + 360.0 else lonDeg
    (wrapped, phi / d2r)
  }

  // ---- Equidistant Cylindrical / Plate Carrée (Snyder §12; PROJ eqc),
  // spherical on the semi-major sphere, standard parallel lat1.

  def eqcForward(lonDeg: Double, latDeg: Double, lat1Deg: Double): (Double, Double) =
    (A * (lonDeg * d2r) * math.cos(lat1Deg * d2r), A * (latDeg * d2r))

  def eqcInverse(x: Double, y: Double, lat1Deg: Double): (Double, Double) =
    ((x / (A * math.cos(lat1Deg * d2r))) / d2r, (y / A) / d2r)

  // ---- Mollweide (Snyder §31; PROJ moll), spherical equal-area on the
  // semi-major sphere. The forward's transcendental 2θ + sin 2θ = π sin φ
  // runs a FIXED 12 Newton steps (machine-converged everywhere except the
  // exact poles, which short-circuit) so results are deterministic.

  def mollForward(lonDeg: Double, latDeg: Double, lon0Deg: Double): (Double, Double) = {
    val phi = latDeg * d2r; val lam = lonDeg * d2r; val lam0 = lon0Deg * d2r
    val sqrt2 = math.sqrt(2.0)
    val theta =
      if (math.abs(math.abs(latDeg) - 90.0) < 1e-13) math.signum(phi) * (math.Pi / 2.0)
      else {
        val target = math.Pi * math.sin(phi)
        var t = 2.0 * phi // t = 2θ
        var k = 0
        while (k < 12) {
          val denom = 1.0 + math.cos(t)
          if (denom > 1e-14) t -= (t + math.sin(t) - target) / denom
          k += 1
        }
        t / 2.0
      }
    val x = (2.0 * sqrt2 / math.Pi) * A * (lam - lam0) * math.cos(theta)
    val y = sqrt2 * A * math.sin(theta)
    (x, y)
  }

  def mollInverse(x: Double, y: Double, lon0Deg: Double): (Double, Double) = {
    val sqrt2 = math.sqrt(2.0)
    val theta = math.asin(math.max(-1.0, math.min(1.0, y / (sqrt2 * A))))
    val phi = math.asin(math.max(-1.0, math.min(1.0,
      (2.0 * theta + math.sin(2.0 * theta)) / math.Pi)))
    val lam =
      if (math.abs(math.cos(theta)) < 1e-12) lon0Deg * d2r
      else lon0Deg * d2r + math.Pi * x / (2.0 * sqrt2 * A * math.cos(theta))
    (lam / d2r, phi / d2r)
  }

  // ---- Perspective azimuthals, spherical oblique forms on the
  // semi-major sphere (+R=a): Orthographic (Snyder §20 20-3..20-4 /
  // 20-14..20-18; PROJ ortho — the "view from infinity" satellite frame),
  // Gnomonic (Snyder §22 22-4..22-5 / 22-14..; PROJ gnom — great circles
  // map to straight lines, the radio/route-planning frame) and oblique
  // Stereographic with k0=1 (Snyder §21 21-2..21-4 / 21-15..; PROJ stere
  // away from the poles — conformal azimuthal; the polar variant-B form
  // lives in psForward above). All three share the (sin c, cos c)
  // spherical-triangle core with aeqd and differ only in the radial
  // scaling k'. Out-of-domain points (the far hemisphere for ortho/gnom,
  // the antipode for stere) are a projection error in PROJ ("tolerance
  // condition") → (NaN, NaN), matching aeqdForward's antipode contract.

  /** Orthographic forward: k' = 1; far hemisphere (cos c < 0) → NaN. */
  def orthoForward(lonDeg: Double, latDeg: Double, lat0Deg: Double,
                   lon0Deg: Double): (Double, Double) = {
    val phi = latDeg * d2r; val dl = (lonDeg - lon0Deg) * d2r
    val phi0 = lat0Deg * d2r
    val cosC = math.sin(phi0) * math.sin(phi) +
      math.cos(phi0) * math.cos(phi) * math.cos(dl)
    if (cosC < 0.0) return (Double.NaN, Double.NaN)
    val x = A * math.cos(phi) * math.sin(dl)
    val y = A * (math.cos(phi0) * math.sin(phi) -
      math.sin(phi0) * math.cos(phi) * math.cos(dl))
    (x, y)
  }

  /** Orthographic inverse (Snyder 20-14..20-18): c = asin(ρ/R); ρ > R is
    * off the disc → NaN. */
  def orthoInverse(x: Double, y: Double, lat0Deg: Double,
                   lon0Deg: Double): (Double, Double) = {
    val phi0 = lat0Deg * d2r; val lam0 = lon0Deg * d2r
    val rho = math.sqrt(x * x + y * y)
    if (rho == 0.0) return (lon0Deg, lat0Deg)
    if (rho > A) return (Double.NaN, Double.NaN)
    val sinC = rho / A
    val cosC = math.sqrt(math.max(0.0, 1.0 - sinC * sinC))
    azInverse(x, y, rho, sinC, cosC, phi0, lam0)
  }

  /** Gnomonic forward: k' = 1 / cos c; the horizon circle and far
    * hemisphere (cos c ≤ ~0) → NaN (k' → ∞ exactly at the horizon). */
  def gnomForward(lonDeg: Double, latDeg: Double, lat0Deg: Double,
                  lon0Deg: Double): (Double, Double) = {
    val phi = latDeg * d2r; val dl = (lonDeg - lon0Deg) * d2r
    val phi0 = lat0Deg * d2r
    val cosC = math.sin(phi0) * math.sin(phi) +
      math.cos(phi0) * math.cos(phi) * math.cos(dl)
    if (cosC < 1e-10) return (Double.NaN, Double.NaN)
    val kp = 1.0 / cosC
    val x = A * kp * math.cos(phi) * math.sin(dl)
    val y = A * kp * (math.cos(phi0) * math.sin(phi) -
      math.sin(phi0) * math.cos(phi) * math.cos(dl))
    (x, y)
  }

  /** Gnomonic inverse (Snyder 22-14..22-17): c = atan(ρ/R). */
  def gnomInverse(x: Double, y: Double, lat0Deg: Double,
                  lon0Deg: Double): (Double, Double) = {
    val phi0 = lat0Deg * d2r; val lam0 = lon0Deg * d2r
    val rho = math.sqrt(x * x + y * y)
    if (rho == 0.0) return (lon0Deg, lat0Deg)
    val c = math.atan2(rho, A)
    azInverse(x, y, rho, math.sin(c), math.cos(c), phi0, lam0)
  }

  /** Oblique stereographic forward, k0 = 1: k = 2 / (1 + cos c); the
    * antipode (cos c = −1) → NaN. */
  def stereForward(lonDeg: Double, latDeg: Double, lat0Deg: Double,
                   lon0Deg: Double): (Double, Double) = {
    val phi = latDeg * d2r; val dl = (lonDeg - lon0Deg) * d2r
    val phi0 = lat0Deg * d2r
    val cosC = math.sin(phi0) * math.sin(phi) +
      math.cos(phi0) * math.cos(phi) * math.cos(dl)
    val den = 1.0 + cosC
    if (den < 1e-10) return (Double.NaN, Double.NaN)
    val k = 2.0 / den
    val x = A * k * math.cos(phi) * math.sin(dl)
    val y = A * k * (math.cos(phi0) * math.sin(phi) -
      math.sin(phi0) * math.cos(phi) * math.cos(dl))
    (x, y)
  }

  /** Oblique stereographic inverse (Snyder 21-15): c = 2 atan(ρ / 2R). */
  def stereInverse(x: Double, y: Double, lat0Deg: Double,
                   lon0Deg: Double): (Double, Double) = {
    val phi0 = lat0Deg * d2r; val lam0 = lon0Deg * d2r
    val rho = math.sqrt(x * x + y * y)
    if (rho == 0.0) return (lon0Deg, lat0Deg)
    val c = 2.0 * math.atan2(rho, 2.0 * A)
    azInverse(x, y, rho, math.sin(c), math.cos(c), phi0, lam0)
  }

  /** Lambert Azimuthal Equal-Area forward, spherical oblique (Snyder §24
    * 24-2..24-4; PROJ laea +R=a — THE equal-area azimuthal, the
    * statistics-grid frame of EPSG:3035/6931/6932). k' = √(2/(1+cos c));
    * the antipode (1+cos c → 0) is a projection error → NaN. */
  def laeaForward(lonDeg: Double, latDeg: Double, lat0Deg: Double,
                  lon0Deg: Double): (Double, Double) = {
    val phi = latDeg * d2r; val dl = (lonDeg - lon0Deg) * d2r
    val phi0 = lat0Deg * d2r
    val den = 1.0 + math.sin(phi0) * math.sin(phi) +
      math.cos(phi0) * math.cos(phi) * math.cos(dl)
    if (den < 1e-10) return (Double.NaN, Double.NaN)
    val kp = math.sqrt(2.0 / den)
    val x = A * kp * math.cos(phi) * math.sin(dl)
    val y = A * kp * (math.cos(phi0) * math.sin(phi) -
      math.sin(phi0) * math.cos(phi) * math.cos(dl))
    (x, y)
  }

  /** LAEA inverse (Snyder 24-16: c = 2 asin(ρ/2R), then the shared
    * azimuthal core); ρ > 2R is off the disc → NaN. */
  def laeaInverse(x: Double, y: Double, lat0Deg: Double,
                  lon0Deg: Double): (Double, Double) = {
    val phi0 = lat0Deg * d2r; val lam0 = lon0Deg * d2r
    val rho = math.sqrt(x * x + y * y)
    if (rho == 0.0) return (lon0Deg, lat0Deg)
    if (rho > 2.0 * A) return (Double.NaN, Double.NaN)
    val c = 2.0 * math.asin(math.min(1.0, rho / (2.0 * A)))
    azInverse(x, y, rho, math.sin(c), math.cos(c), phi0, lam0)
  }

  // ---- Miller Cylindrical (Snyder §18 18-1..18-4; PROJ mill, +R=a) —
  // the compromise world-map cylindrical: the Mercator ordinate computed
  // at 0.8·φ and stretched back by 1/0.8, so the poles stay finite.

  def millForward(lonDeg: Double, latDeg: Double, lon0Deg: Double): (Double, Double) = {
    val phi = latDeg * d2r
    val x = A * ((lonDeg - lon0Deg) * d2r)
    val y = A * math.log(math.tan(math.Pi / 4.0 + 0.4 * phi)) / 0.8
    (x, y)
  }

  /** Miller inverse (Snyder 18-4: φ = 2.5 atan(e^(0.8y/R)) − 5π/8). */
  def millInverse(x: Double, y: Double, lon0Deg: Double): (Double, Double) = {
    val lam = x / A + lon0Deg * d2r
    val phi = 2.5 * math.atan(math.exp(0.8 * y / A)) - 5.0 * math.Pi / 8.0
    val lonDeg = lam / d2r
    val wrapped = if (lonDeg > 180.0) lonDeg - 360.0
      else if (lonDeg <= -180.0) lonDeg + 360.0 else lonDeg
    (wrapped, phi / d2r)
  }

  /** Shared azimuthal inverse core (Snyder 20-14/20-15 form, valid for
    * every azimuthal once (sin c, cos c) is known), with the PROJ adjlon
    * wrap to (−180, 180] that aeqdInverse uses. */
  @inline private def azInverse(x: Double, y: Double, rho: Double,
      sinC: Double, cosC: Double, phi0: Double, lam0: Double): (Double, Double) = {
    val phi = math.asin(math.max(-1.0, math.min(1.0,
      cosC * math.sin(phi0) + y * sinC * math.cos(phi0) / rho)))
    val lam = lam0 + math.atan2(x * sinC,
      rho * math.cos(phi0) * cosC - y * math.sin(phi0) * sinC)
    val lonDeg = lam / d2r
    val wrapped = if (lonDeg > 180.0) lonDeg - 360.0
      else if (lonDeg <= -180.0) lonDeg + 360.0 else lonDeg
    (wrapped, phi / d2r)
  }

  // ---- geometry-level transforms (WKB path goes through GeoKernel)

  def orthoGeom(g: Geom, lat0: Double, lon0: Double): Geom =
    GeoOps.mapCoords(g, (x, y) => orthoForward(x, y, lat0, lon0))
  def orthoInvGeom(g: Geom, lat0: Double, lon0: Double): Geom =
    GeoOps.mapCoords(g, (x, y) => orthoInverse(x, y, lat0, lon0))
  def gnomGeom(g: Geom, lat0: Double, lon0: Double): Geom =
    GeoOps.mapCoords(g, (x, y) => gnomForward(x, y, lat0, lon0))
  def gnomInvGeom(g: Geom, lat0: Double, lon0: Double): Geom =
    GeoOps.mapCoords(g, (x, y) => gnomInverse(x, y, lat0, lon0))
  def stereGeom(g: Geom, lat0: Double, lon0: Double): Geom =
    GeoOps.mapCoords(g, (x, y) => stereForward(x, y, lat0, lon0))
  def stereInvGeom(g: Geom, lat0: Double, lon0: Double): Geom =
    GeoOps.mapCoords(g, (x, y) => stereInverse(x, y, lat0, lon0))

  def aeqdGeom(g: Geom, lat0: Double, lon0: Double): Geom =
    GeoOps.mapCoords(g, (x, y) => aeqdForward(x, y, lat0, lon0))
  def aeqdInvGeom(g: Geom, lat0: Double, lon0: Double): Geom =
    GeoOps.mapCoords(g, (x, y) => aeqdInverse(x, y, lat0, lon0))
  def eqcGeom(g: Geom, lat1: Double): Geom =
    GeoOps.mapCoords(g, (x, y) => eqcForward(x, y, lat1))
  def eqcInvGeom(g: Geom, lat1: Double): Geom =
    GeoOps.mapCoords(g, (x, y) => eqcInverse(x, y, lat1))
  def laeaGeom(g: Geom, lat0: Double, lon0: Double): Geom =
    GeoOps.mapCoords(g, (x, y) => laeaForward(x, y, lat0, lon0))
  def laeaInvGeom(g: Geom, lat0: Double, lon0: Double): Geom =
    GeoOps.mapCoords(g, (x, y) => laeaInverse(x, y, lat0, lon0))
  def millGeom(g: Geom, lon0: Double): Geom =
    GeoOps.mapCoords(g, (x, y) => millForward(x, y, lon0))
  def millInvGeom(g: Geom, lon0: Double): Geom =
    GeoOps.mapCoords(g, (x, y) => millInverse(x, y, lon0))

  def mollGeom(g: Geom, lon0: Double): Geom =
    GeoOps.mapCoords(g, (x, y) => mollForward(x, y, lon0))
  def mollInvGeom(g: Geom, lon0: Double): Geom =
    GeoOps.mapCoords(g, (x, y) => mollInverse(x, y, lon0))

  def psGeom(g: Geom, latTs: Double, lon0: Double): Geom = {
    val p = psParams(latTs, lon0)
    GeoOps.mapCoords(g, (x, y) => psForward(x, y, p))
  }
  def psInvGeom(g: Geom, latTs: Double, lon0: Double): Geom = {
    val p = psParams(latTs, lon0)
    GeoOps.mapCoords(g, (x, y) => psInverse(x, y, p))
  }
  def sinuGeom(g: Geom, lon0: Double): Geom = {
    val p = sinuParams(lon0)
    GeoOps.mapCoords(g, (x, y) => sinuForward(x, y, p))
  }
  def sinuInvGeom(g: Geom, lon0: Double): Geom = {
    val p = sinuParams(lon0)
    GeoOps.mapCoords(g, (x, y) => sinuInverse(x, y, p))
  }

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
