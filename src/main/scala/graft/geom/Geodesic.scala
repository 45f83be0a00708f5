package graft.geom

/** Ellipsoidal (WGS84) geodesic measures — the engine-side analog of
  * OGR's get_GeodesicLength / get_GeodesicArea
  * (/root/reference/ogr/ogrlinestring.cpp:3225-3262, surfaced in SQL as
  * ST_Length(geom,1) / ST_Area(geom,1),
  * ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:630,675). The
  * reference delegates to PROJ's geod_inverse / geod_polygonarea
  * (Karney's GeographicLib); this implementation uses two published
  * closed-form algorithms chosen so the DuckDB oracle can evaluate the
  * IDENTICAL arithmetic:
  *
  *  - segment length: Vincenty's inverse formula (Vincenty 1975, Survey
  *    Review 23/176) with a FIXED 8-iteration λ relaxation (convergence is
  *    quadratic; 8 iterations are exhaustive for non-antipodal pairs and
  *    make the computation a pure expression tree, SQL-twin-able).
  *    Deviation vs Karney: < 0.5 mm except near-antipodal inputs, where
  *    Vincenty classically fails to converge — documented, as in most
  *    Vincenty deployments.
  *
  *  - polygon area: area on the AUTHALIC sphere (Snyder 1987, eq. 3-11/
  *    3-12): vertices mapped to authalic latitude, the spherical polygon
  *    area computed exactly with the Van Oosterom–Strackee (1983) triangle
  *    solid-angle formula fanned from the first vertex, scaled by Rq².
  *    Deviation vs geod_polygonarea: the edge paths differ (geodesics vs
  *    great circles on the authalic sphere), negligible for sub-continental
  *    edges; the area mapping itself is exact.
  */
object Geodesic {

  final val A = 6378137.0                 // WGS84 semi-major
  final val F = 1.0 / 298.257223563       // flattening
  final val B = A * (1.0 - F)             // semi-minor
  final val E2 = F * (2.0 - F)            // first eccentricity²
  final val E = math.sqrt(E2)

  /** Authalic sphere radius Rq (Snyder 3-13): sqrt(a²/2 + b²/2·atanh(e)/e). */
  final val AuthalicR: Double =
    math.sqrt(A * A / 2.0 + B * B / 2.0 * (0.5 * math.log((1 + E) / (1 - E))) / E)

  /** Snyder q (3-12) at geodetic latitude phi (radians). */
  def qOf(phi: Double): Double = {
    val s = math.sin(phi)
    (1.0 - E2) * (s / (1.0 - E2 * s * s) -
      (1.0 / (2.0 * E)) * math.log((1.0 - E * s) / (1.0 + E * s)))
  }

  /** q at the pole — the authalic normalizer (public: the oracle SQL embeds
    * this exact double as a literal). */
  val qPole: Double = qOf(math.Pi / 2)

  /** Authalic latitude (radians) of geodetic latitude (radians). */
  def authalicLat(phi: Double): Double = {
    val r = qOf(phi) / qPole
    math.asin(math.max(-1.0, math.min(1.0, r)))
  }

  /** Vincenty inverse distance in meters, FIXED 8 iterations; degrees in.
    * Coincident points → 0 exactly. */
  def vincenty(lat1d: Double, lon1d: Double, lat2d: Double, lon2d: Double): Double = {
    if (lat1d == lat2d && lon1d == lon2d) return 0.0
    val rad = math.Pi / 180.0
    val u1 = math.atan((1.0 - F) * math.tan(lat1d * rad))
    val u2 = math.atan((1.0 - F) * math.tan(lat2d * rad))
    val l = (lon2d - lon1d) * rad
    val sinU1 = math.sin(u1); val cosU1 = math.cos(u1)
    val sinU2 = math.sin(u2); val cosU2 = math.cos(u2)
    var lam = l
    var sinSig = 0.0; var cosSig = 0.0; var sig = 0.0
    var cos2Alpha = 0.0; var cos2SigM = 0.0
    var it = 0
    while (it < 8) {
      val sinLam = math.sin(lam); val cosLam = math.cos(lam)
      val t1 = cosU2 * sinLam
      val t2 = cosU1 * sinU2 - sinU1 * cosU2 * cosLam
      sinSig = math.sqrt(t1 * t1 + t2 * t2)
      cosSig = sinU1 * sinU2 + cosU1 * cosU2 * cosLam
      sig = math.atan2(sinSig, cosSig)
      val sinAlpha = if (sinSig == 0.0) 0.0 else cosU1 * cosU2 * sinLam / sinSig
      cos2Alpha = 1.0 - sinAlpha * sinAlpha
      cos2SigM =
        if (cos2Alpha == 0.0) 0.0 // equatorial line
        else cosSig - 2.0 * sinU1 * sinU2 / cos2Alpha
      val c = F / 16.0 * cos2Alpha * (4.0 + F * (4.0 - 3.0 * cos2Alpha))
      lam = l + (1.0 - c) * F * sinAlpha *
        (sig + c * sinSig * (cos2SigM + c * cosSig * (-1.0 + 2.0 * cos2SigM * cos2SigM)))
      it += 1
    }
    val uu = cos2Alpha * (A * A - B * B) / (B * B)
    val bigA = 1.0 + uu / 16384.0 * (4096.0 + uu * (-768.0 + uu * (320.0 - 175.0 * uu)))
    val bigB = uu / 1024.0 * (256.0 + uu * (-128.0 + uu * (74.0 - 47.0 * uu)))
    val dSig = bigB * sinSig * (cos2SigM + bigB / 4.0 *
      (cosSig * (-1.0 + 2.0 * cos2SigM * cos2SigM) -
        bigB / 6.0 * cos2SigM * (-3.0 + 4.0 * sinSig * sinSig) *
          (-3.0 + 4.0 * cos2SigM * cos2SigM)))
    B * bigA * (sig - dSig)
  }

  /** Geodesic length of interleaved (lon,lat,…) degrees coords: Vincenty
    * sum over consecutive segments. */
  def lineLength(cs: Array[Double]): Double = {
    var sum = 0.0
    var i = 2
    while (i < cs.length) {
      sum += vincenty(cs(i - 1), cs(i - 2), cs(i + 1), cs(i))
      i += 2
    }
    sum
  }

  /** Signed spherical-polygon solid angle (steradians) of an authalic-
    * mapped ring via Van Oosterom–Strackee triangle fan from vertex 0.
    * Ring = interleaved (lon,lat) degrees, closed or open. */
  def ringSolidAngle(cs: Array[Double]): Double = {
    val rad = math.Pi / 180.0
    val n0 = cs.length / 2
    val n = if (n0 > 1 && cs(0) == cs(2 * n0 - 2) && cs(1) == cs(2 * n0 - 1)) n0 - 1 else n0
    if (n < 3) return 0.0
    val vx = new Array[Double](n); val vy = new Array[Double](n); val vz = new Array[Double](n)
    var i = 0
    while (i < n) {
      val lon = cs(2 * i) * rad
      val xi = authalicLat(cs(2 * i + 1) * rad)
      val c = math.cos(xi)
      vx(i) = c * math.cos(lon); vy(i) = c * math.sin(lon); vz(i) = math.sin(xi)
      i += 1
    }
    var omega = 0.0
    var k = 1
    while (k < n - 1) {
      // Van Oosterom & Strackee 1983: tan(Ω/2) = A·(B×C) / (1 + A·B + B·C + C·A)
      val ax = vx(0); val ay = vy(0); val az = vz(0)
      val bx = vx(k); val by = vy(k); val bz = vz(k)
      val cx = vx(k + 1); val cy = vy(k + 1); val cz = vz(k + 1)
      val num = ax * (by * cz - bz * cy) + ay * (bz * cx - bx * cz) + az * (bx * cy - by * cx)
      val den = 1.0 + (ax * bx + ay * by + az * bz) + (bx * cx + by * cy + bz * cz) +
        (cx * ax + cy * ay + cz * az)
      omega += 2.0 * math.atan2(num, den)
      k += 1
    }
    omega
  }

  /** Geodesic (authalic) ring area in m², unsigned. */
  def ringArea(cs: Array[Double]): Double =
    math.abs(ringSolidAngle(cs)) * AuthalicR * AuthalicR

  /** Geometry-level measures, mirroring the planar GeoOps shape
    * (polygon = exterior − holes; length = curve sum / ring perimeters). */
  def area(g: Geom): Double = g match {
    case p: Polygon =>
      if (p.isEmpty) 0.0
      else ringArea(p.rings(0)) - p.rings.drop(1).map(ringArea).sum
    case m: MultiPolygon => m.polys.map(area).sum
    case c: GeometryCollection => c.geoms.map(area).sum
    case s: Surface => area(s.toMulti)
    case _ => 0.0
  }

  def length(g: Geom): Double = g match {
    case l: LineString => lineLength(l.coords)
    case m: MultiLineString => m.lines.map(l => lineLength(l.coords)).sum
    case p: Polygon => p.rings.map(lineLength).sum
    case m: MultiPolygon => m.polys.map(length).sum
    case c: GeometryCollection => c.geoms.map(length).sum
    case s: Surface => length(s.toMulti)
    case _ => 0.0
  }
}
