package graft.geom

/** Ellipsoidal transverse Mercator (UTM) forward/inverse on WGS84, using
  * the classic series from Snyder, "Map Projections — A Working Manual"
  * (USGS PP 1395, 1987, public domain), the same formulation PROJ's tmerc
  * implements (reference: /root/reference/ogr/ogrct.cpp delegates to PROJ;
  * this engine carries the v1 projection set natively — 3857 + UTM).
  *
  * Accuracy: the 6th-order series is sub-millimeter within a UTM zone;
  * operation order is fixed so an SQL twin of the same series is
  * numerically identical. */
object Utm {

  final val A = 6378137.0
  final val F = 1.0 / 298.257223563
  final val K0 = 0.9996
  final val FalseEasting = 500000.0

  private val e2 = F * (2.0 - F)
  private val e4 = e2 * e2
  private val e6 = e4 * e2
  private val ep2 = e2 / (1.0 - e2)

  def zoneCentralLonDeg(zone: Int): Double = -183.0 + 6.0 * zone

  /** Meridional arc M(φ) (Snyder 3-21). */
  private def mOf(phi: Double): Double =
    A * ((1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0) * phi -
      (3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0) * math.sin(2.0 * phi) +
      (15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0) * math.sin(4.0 * phi) -
      (35.0 * e6 / 3072.0) * math.sin(6.0 * phi))

  /** Forward: lon/lat degrees → (easting, northing) for the northern
    * hemisphere convention (no 10,000 km false northing). Snyder 8-9..8-13. */
  def forward(lonDeg: Double, latDeg: Double, zone: Int): (Double, Double) = {
    val d2r = math.Pi / 180.0
    val phi = latDeg * d2r
    val lam = lonDeg * d2r
    val lam0 = zoneCentralLonDeg(zone) * d2r
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val n = A / math.sqrt(1.0 - e2 * sinP * sinP)
    val t = tanP * tanP
    val c = ep2 * cosP * cosP
    val aa = (lam - lam0) * cosP
    val m = mOf(phi)
    val x = K0 * n * (aa + (1.0 - t + c) * (aa * aa * aa) / 6.0 +
      (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * ep2) *
        (aa * aa * aa * aa * aa) / 120.0) + FalseEasting
    val y = K0 * (m + n * tanP * ((aa * aa) / 2.0 +
      (5.0 - t + 9.0 * c + 4.0 * c * c) * (aa * aa * aa * aa) / 24.0 +
      (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * ep2) *
        (aa * aa * aa * aa * aa * aa) / 720.0))
    (x, y)
  }

  /** Inverse: (easting, northing) → lon/lat degrees (Snyder 8-17..8-25,
    * footpoint latitude via the e1 series). */
  def inverse(x0: Double, y0: Double, zone: Int): (Double, Double) = {
    val x = x0 - FalseEasting
    val m = y0 / K0
    val e1 = (1.0 - math.sqrt(1.0 - e2)) / (1.0 + math.sqrt(1.0 - e2))
    val mu = m / (A * (1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0))
    val phi1 = mu +
      (3.0 * e1 / 2.0 - 27.0 * e1 * e1 * e1 / 32.0) * math.sin(2.0 * mu) +
      (21.0 * e1 * e1 / 16.0 - 55.0 * e1 * e1 * e1 * e1 / 32.0) * math.sin(4.0 * mu) +
      (151.0 * e1 * e1 * e1 / 96.0) * math.sin(6.0 * mu) +
      (1097.0 * e1 * e1 * e1 * e1 / 512.0) * math.sin(8.0 * mu)
    val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
    val c1 = ep2 * cosP * cosP
    val t1 = tanP * tanP
    val n1 = A / math.sqrt(1.0 - e2 * sinP * sinP)
    val r1 = A * (1.0 - e2) / math.pow(1.0 - e2 * sinP * sinP, 1.5)
    val d = x / (n1 * K0)
    val phi = phi1 - (n1 * tanP / r1) * (d * d / 2.0 -
      (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1 * c1 - 9.0 * ep2) *
        (d * d * d * d) / 24.0 +
      (61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1 * t1 - 252.0 * ep2 - 3.0 * c1 * c1) *
        (d * d * d * d * d * d) / 720.0)
    val lam = (d - (1.0 + 2.0 * t1 + c1) * (d * d * d) / 6.0 +
      (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1 * c1 + 8.0 * ep2 + 24.0 * t1 * t1) *
        (d * d * d * d * d) / 120.0) / cosP
    val r2d = 180.0 / math.Pi
    (zoneCentralLonDeg(zone) + lam * r2d, phi * r2d)
  }

  def transformGeom(g: Geom, zone: Int): Geom =
    GeoOps.mapCoords(g, (x, y) => forward(x, y, zone))

  def inverseGeom(g: Geom, zone: Int): Geom =
    GeoOps.mapCoords(g, (x, y) => inverse(x, y, zone))
}
