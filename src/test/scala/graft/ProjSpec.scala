package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Proj, Projection, TileGrid, Utm, Slippy}

/** core/Proj.scala — the extended CRS family. Three independent lines of
  * evidence per projection: (1) published worked examples (EPSG GN7-2 /
  * Snyder PP 1395 numeric examples); (2) differential-geometry invariants
  * measured by finite differences (conformal ⇒ meridian scale = parallel
  * scale; equal-area ⇒ Jacobian = ellipsoid area element; standard
  * parallels ⇒ scale 1) — these validate the TRANSCRIPTION independently
  * of any remembered constant; (3) forward∘inverse round-trips.
  */
class ProjSpec extends AnyFunSuite {

  private val degToRad = math.Pi / 180.0

  /** meridian radius M(φ) and prime-vertical radius N(φ). */
  private def radii(sph: Proj.Spheroid, phi: Double): (Double, Double) = {
    val s = math.sin(phi)
    val den = 1.0 - sph.es * s * s
    (sph.a * (1.0 - sph.es) / math.pow(den, 1.5), sph.a / math.sqrt(den))
  }

  // ---- helper identities -------------------------------------------------

  test("tsfn equals exp(-isometric latitude) — independent transcription check") {
    def atanh(x: Double) = 0.5 * math.log((1.0 + x) / (1.0 - x))
    for (latDeg <- Seq(-80.0, -45.0, -10.0, 0.0, 7.5, 33.3, 41.0, 60.0, 84.9)) {
      val phi = latDeg * degToRad
      val e = Proj.WGS84.e
      val psi = atanh(math.sin(phi)) - e * atanh(e * math.sin(phi))
      val t = Proj.tsfn(phi, e)
      assert(math.abs(t - math.exp(-psi)) <= 1e-14 * math.max(1.0, t),
        s"lat=$latDeg t=$t exp(-psi)=${math.exp(-psi)}")
    }
  }

  test("phi2 inverts tsfn to sub-nanodegree") {
    for (latDeg <- Seq(-89.0, -45.0, 0.0, 0.5, 41.0, 89.0)) {
      val phi = latDeg * degToRad
      val back = Proj.phi2(Proj.tsfn(phi, Proj.WGS84.e), Proj.WGS84.e)
      assert(math.abs(back - phi) < 1e-12, s"lat=$latDeg")
    }
  }

  // ---- EPSG:3395 World Mercator -----------------------------------------

  test("3395: x = a·lambda exactly; y = 0 on the equator; round-trip") {
    val (x, y) = Proj.mercatorForward(Proj.WGS84, 45.0, 0.0)
    assert(x === 6378137.0 * (45.0 * degToRad))
    assert(math.abs(y) < 1e-9)
    for ((lon, lat) <- Seq((-179.0, -82.0), (13.4, 52.5), (151.2, -33.9))) {
      val (fx, fy) = Proj.mercatorForward(Proj.WGS84, lon, lat)
      val (blon, blat) = Proj.mercatorInverse(Proj.WGS84, fx, fy)
      assert(math.abs(blon - lon) < 1e-12 && math.abs(blat - lat) < 1e-9)
    }
  }

  test("3395 is conformal: meridian scale == parallel scale (finite diff)") {
    val d = 1e-7
    for (latDeg <- Seq(-60.0, -15.0, 10.0, 41.0, 75.0)) {
      val phi = latDeg * degToRad
      val (mRad, nRad) = radii(Proj.WGS84, phi)
      val (_, y1) = Proj.mercatorForward(Proj.WGS84, 0.0, latDeg - d)
      val (_, y2) = Proj.mercatorForward(Proj.WGS84, 0.0, latDeg + d)
      val h = (y2 - y1) / (2.0 * d * degToRad) / mRad
      val (x1, _) = Proj.mercatorForward(Proj.WGS84, -d, latDeg)
      val (x2, _) = Proj.mercatorForward(Proj.WGS84, d, latDeg)
      val k = (x2 - x1) / (2.0 * d * degToRad) / (nRad * math.cos(phi))
      assert(math.abs(h - k) < 1e-5 * k, s"lat=$latDeg h=$h k=$k")
    }
  }

  // ---- EPSG:4087 ---------------------------------------------------------

  test("4087: plate carree on the WGS84 radius") {
    val (x, y) = Proj.eqcForward(Proj.WGS84, 90.0, -45.0)
    assert(x === 6378137.0 * (90.0 * degToRad))
    assert(y === 6378137.0 * (-45.0 * degToRad))
    val (lon, lat) = Proj.eqcInverse(Proj.WGS84, x, y)
    assert(math.abs(lon - 90.0) < 1e-12 && math.abs(lat + 45.0) < 1e-12)
  }

  // ---- Lambert Conformal Conic 2SP ---------------------------------------

  /** EPSG GN7-2, Lambert Conic Conformal (2SP) worked example — NAD27 /
    * Texas South Central (Clarke 1866, US survey feet): φ1 28°23′N,
    * φ2 30°17′N, false origin 27°50′N 99°00′W, EF 2,000,000.00 ftUS.
    * Test point 28°30′N 96°00′W → E 2,963,503.91 ftUS, N 254,759.80 ftUS.
    */
  test("LCC 2SP: EPSG GN7-2 worked example (Texas South Central, ftUS)") {
    val p = Proj.Lcc2SP(Proj.Clarke1866,
      28.0 + 23.0 / 60.0, 30.0 + 17.0 / 60.0,
      27.0 + 50.0 / 60.0, -99.0, 2000000.0, 0.0, Proj.FtUs)
    val (e, n) = p.forward(-96.0, 28.5)
    assert(math.abs(e - 2963503.91) < 0.05, s"E=$e")
    assert(math.abs(n - 254759.80) < 0.05, s"N=$n")
    val (lon, lat) = p.inverse(e, n)
    assert(math.abs(lon + 96.0) < 1e-9 && math.abs(lat - 28.5) < 1e-9)
  }

  test("LCC 2SP: scale factor 1 on both standard parallels (finite diff)") {
    val p = Projection.Epsg2263
    val d = 1e-7
    for (latDeg <- Seq(40.0 + 40.0 / 60.0, 41.0 + 2.0 / 60.0)) {
      val phi = latDeg * degToRad
      val (_, nRad) = radii(Proj.GRS80, phi)
      val (x1, y1) = p.forward(-74.0 - d, latDeg)
      val (x2, y2) = p.forward(-74.0 + d, latDeg)
      val dist = math.hypot(x2 - x1, y2 - y1) * Proj.FtUs // back to meters
      val k = dist / (2.0 * d * degToRad * nRad * math.cos(phi))
      assert(math.abs(k - 1.0) < 1e-6, s"lat=$latDeg k=$k")
    }
  }

  test("LCC 2SP is conformal off the standard parallels (finite diff h == k)") {
    val p = Projection.Epsg2154 // meters, easier radii bookkeeping
    val d = 1e-7
    for ((lonDeg, latDeg) <- Seq((2.35, 48.85), (5.37, 43.3), (-1.55, 47.2))) {
      val phi = latDeg * degToRad
      val (mRad, nRad) = radii(Proj.GRS80, phi)
      val (ax1, ay1) = p.forward(lonDeg, latDeg - d)
      val (ax2, ay2) = p.forward(lonDeg, latDeg + d)
      val h = math.hypot(ax2 - ax1, ay2 - ay1) / (2.0 * d * degToRad * mRad)
      val (bx1, by1) = p.forward(lonDeg - d, latDeg)
      val (bx2, by2) = p.forward(lonDeg + d, latDeg)
      val k = math.hypot(bx2 - bx1, by2 - by1) / (2.0 * d * degToRad * nRad * math.cos(phi))
      assert(math.abs(h - k) < 1e-5 * k, s"($lonDeg,$latDeg) h=$h k=$k")
    }
  }

  test("LCC 2SP: 2263 round-trips across the NYC region") {
    val p = Projection.Epsg2263
    for ((lon, lat) <- Seq((-74.0, 40.7), (-73.6, 40.75), (-72.8, 41.1), (-74.3, 40.5))) {
      val (e, n) = p.forward(lon, lat)
      val (blon, blat) = p.inverse(e, n)
      assert(math.abs(blon - lon) < 1e-10 && math.abs(blat - lat) < 1e-10,
        s"($lon,$lat) -> ($e,$n) -> ($blon,$blat)")
    }
  }

  // ---- Transverse Mercator (general) --------------------------------------

  /** EPSG GN7-2, Transverse Mercator worked example — OSGB36 / British
    * National Grid: 50°30′N 0°30′E → E 577,274.99 N 69,740.50.
    */
  test("TM: EPSG GN7-2 worked example (British National Grid)") {
    val p = Projection.Epsg27700
    val (e, n) = p.forward(0.5, 50.5)
    assert(math.abs(e - 577274.99) < 0.03, s"E=$e")
    assert(math.abs(n - 69740.50) < 0.03, s"N=$n")
    val (lon, lat) = p.inverse(e, n)
    assert(math.abs(lon - 0.5) < 1e-8 && math.abs(lat - 50.5) < 1e-8)
  }

  test("TM general agrees with the UTM parity path at UTM parameters") {
    // Utm.scala carries the reference's rounded e2 and series quirks;
    // agreement is mm-level near the central meridian, not exact.
    val zone31 = Proj.Tm(Proj.WGS84, 0.9996, 0.0, 3.0, 500000.0, 0.0)
    for ((lon, lat) <- Seq((3.0, 48.0), (3.7, 52.1), (2.4, 44.4))) {
      val (e, n) = zone31.forward(lon, lat)
      val c = Utm.fromLngLatZone(lon, lat, Utm.Zone(31, 'U')).get
      assert(math.abs(e - c.easting) < 2e-3, s"($lon,$lat) dE=${e - c.easting}")
      assert(math.abs(n - c.northing) < 2e-3, s"($lon,$lat) dN=${n - c.northing}")
    }
  }

  test("TM is conformal (finite diff h == k)") {
    val p = Projection.Epsg27700
    val d = 1e-7
    for ((lonDeg, latDeg) <- Seq((-0.1, 51.5), (-3.2, 55.95), (-5.9, 54.6))) {
      val phi = latDeg * degToRad
      val (mRad, nRad) = radii(Proj.Airy1830, phi)
      val (ax1, ay1) = p.forward(lonDeg, latDeg - d)
      val (ax2, ay2) = p.forward(lonDeg, latDeg + d)
      val h = math.hypot(ax2 - ax1, ay2 - ay1) / (2.0 * d * degToRad * mRad)
      val (bx1, by1) = p.forward(lonDeg - d, latDeg)
      val (bx2, by2) = p.forward(lonDeg + d, latDeg)
      val k = math.hypot(bx2 - bx1, by2 - by1) / (2.0 * d * degToRad * nRad * math.cos(phi))
      assert(math.abs(h - k) < 1e-5 * k, s"($lonDeg,$latDeg) h=$h k=$k")
    }
  }

  // ---- Albers Equal-Area ---------------------------------------------------

  /** Snyder PP 1395, Albers numeric example (ellipsoid, Clarke 1866):
    * φ1 29°30′, φ2 45°30′, origin 23°N 96°W; point 35°N 75°W →
    * x 1,885,472.7 m, y 1,535,925.0 m.
    */
  test("Albers: Snyder worked example (Clarke 1866)") {
    val p = Proj.Aea(Proj.Clarke1866, 29.5, 45.5, 23.0, -96.0, 0.0, 0.0)
    val (x, y) = p.forward(-75.0, 35.0)
    assert(math.abs(x - 1885472.7) < 0.5, s"x=$x")
    assert(math.abs(y - 1535925.0) < 0.5, s"y=$y")
    val (lon, lat) = p.inverse(x, y)
    assert(math.abs(lon + 75.0) < 1e-9 && math.abs(lat - 35.0) < 1e-9)
  }

  test("Albers is equal-area: Jacobian equals the ellipsoid area element") {
    val p = Projection.Epsg5070
    val d = 1e-6
    for ((lonDeg, latDeg) <- Seq((-96.0, 37.0), (-120.0, 47.0), (-75.0, 40.0), (-88.0, 30.0))) {
      val phi = latDeg * degToRad
      val (mRad, nRad) = radii(Proj.GRS80, phi)
      val (x1, y1) = p.forward(lonDeg - d, latDeg)
      val (x2, y2) = p.forward(lonDeg + d, latDeg)
      val (x3, y3) = p.forward(lonDeg, latDeg - d)
      val (x4, y4) = p.forward(lonDeg, latDeg + d)
      val dLam = 2.0 * d * degToRad; val dPhi = 2.0 * d * degToRad
      val jac = math.abs(((x2 - x1) / dLam) * ((y4 - y3) / dPhi) -
        ((x4 - x3) / dLam) * ((y2 - y1) / dPhi))
      val areaElem = mRad * nRad * math.cos(phi)
      assert(math.abs(jac - areaElem) < 1e-4 * areaElem,
        s"($lonDeg,$latDeg) jac=$jac area=$areaElem")
    }
  }

  test("Albers: scale 1 along both standard parallels; round-trip incl. 3310") {
    val p = Projection.Epsg5070
    val d = 1e-7
    for (latDeg <- Seq(29.5, 45.5)) {
      val phi = latDeg * degToRad
      val (_, nRad) = radii(Proj.GRS80, phi)
      val (x1, y1) = p.forward(-96.0 - d, latDeg)
      val (x2, y2) = p.forward(-96.0 + d, latDeg)
      val k = math.hypot(x2 - x1, y2 - y1) / (2.0 * d * degToRad * nRad * math.cos(phi))
      assert(math.abs(k - 1.0) < 1e-6, s"lat=$latDeg k=$k")
    }
    val ca = Projection.Epsg3310
    for ((lon, lat) <- Seq((-122.4, 37.8), (-118.2, 34.05), (-116.5, 33.8))) {
      val (x, y) = ca.forward(lon, lat)
      val (blon, blat) = ca.inverse(x, y)
      assert(math.abs(blon - lon) < 1e-9 && math.abs(blat - lat) < 1e-9)
    }
  }

  // ---- registry + TileGrid integration ------------------------------------

  test("forSrid resolves the extended family; TileGrid(2263) round-trips cells") {
    for (srid <- Seq(4326, 3857, 3395, 4087, 2263, 2154, 3347, 27700, 5070, 3310, 32633, 32733))
      assert(Projection.forSrid(srid).exists(_.srid == srid), s"srid=$srid")
    assert(Projection.forSrid(999999).isEmpty)

    val grid = TileGrid(Projection.Epsg2263)
    // native state-plane coordinates of Manhattan-ish points
    for ((lon, lat) <- Seq((-73.97, 40.78), (-73.78, 40.64), (-73.95, 40.65))) {
      val (nx, ny) = Projection.Epsg2263.forward(lon, lat)
      val cell = grid.cellAt(15, nx, ny)
      // the cell's native extent must contain the native point
      val ext = grid.extent(15, Slippy.unpackX(cell).toInt, Slippy.unpackY(cell).toInt)
      assert(nx >= ext.minx && nx <= ext.maxx && ny >= ext.miny && ny <= ext.maxy,
        s"($lon,$lat) cell=${Slippy.unpackZ(cell)}/${Slippy.unpackX(cell)}/${Slippy.unpackY(cell)} ext=$ext native=($nx,$ny)")
    }
    // fromBounds over a small native box is small and non-empty
    val (ax, ay) = Projection.Epsg2263.forward(-74.02, 40.70)
    val (bx, by) = Projection.Epsg2263.forward(-73.93, 40.78)
    val cells = grid.fromBounds(13, math.min(ax, bx), math.min(ay, by),
      math.max(ax, bx), math.max(ay, by))
    assert(cells.nonEmpty && cells.size < 64)
  }
}
