package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core._
import graft.core.Geom._

/** Base class for the engine's Catalyst expressions: evaluates all children,
  * short-circuits nulls (null-intolerant semantics), and hands boxed values
  * to `evalN`. Codegen starts as CodegenFallback; hot expressions override
  * doGenCode with static kernel calls (see CellCodegen).
  */
/** graft's expression base — see org.apache.spark.sql.graft.GeomExprBase. */
abstract class GeomExpr extends org.apache.spark.sql.graft.GeomExprBase

/** base for whole-stage-codegen'd static-kernel expressions. */
abstract class GeomExprGen extends org.apache.spark.sql.graft.GeomExprStatic

object GeomExpr {
  val pointStruct: StructType =
    StructType(Seq(StructField("x", DoubleType, false), StructField("y", DoubleType, false)))
  val segStruct: StructType = StructType(Seq(
    StructField("x1", DoubleType, false), StructField("y1", DoubleType, false),
    StructField("x2", DoubleType, false), StructField("y2", DoubleType, false)))
  val envStruct: StructType = StructType(Seq(
    StructField("minx", DoubleType, false), StructField("miny", DoubleType, false),
    StructField("maxx", DoubleType, false), StructField("maxy", DoubleType, false)))
  val intersectStruct: StructType = StructType(Seq(
    StructField("x", DoubleType, false), StructField("y", DoubleType, false),
    StructField("ok", BooleanType, false)))

  def utf8(s: String): UTF8String = UTF8String.fromString(s)
  def row(vs: Any*): GenericInternalRow = new GenericInternalRow(vs.toArray)

  /** decode helper: parse WKB or return null on garbage. */
  def geomOrNull(bytes: Array[Byte]): Geom.Geometry =
    try Wkb.decode(bytes)
    catch { case _: Exception => null }
}

import GeomExpr._

// ---------------------------------------------------------------------------
// codecs / constructors / accessors
// ---------------------------------------------------------------------------

/** WKT text → WKB binary (null on parse failure). reference wkt_decode.go. */
case class StGeomFromWkt(child: Expression)
    extends org.apache.spark.sql.graft.GeomExprStaticRef {
  override def inputTypesImpl: Seq[DataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  protected def staticKernel: String = "graft.core.WkbKernels.fromWkt"
  protected def evalN(v: Array[Any]): Any =
    graft.core.WkbKernels.fromWkt(v(0).asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

/** WKB → WKT text. reference wkt_encode.go. */
case class StAsWkt(child: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = StringType
  protected def evalN(v: Array[Any]): Any = {
    val g = geomOrNull(v(0).asInstanceOf[Array[Byte]])
    if (g == null) null else utf8(Wkt.encode(g))
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

/** (x, y) → point WKB. */
case class StPoint(xe: Expression, ye: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def children: Seq[Expression] = Seq(xe, ye)
  override def dataType: DataType = BinaryType
  protected def evalN(v: Array[Any]): Any =
    Wkb.encode(GPoint((v(0).asInstanceOf[Double], v(1).asInstanceOf[Double])))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

/** (minx,miny,maxx,maxy) → rectangle polygon WKB with the reference's
  * CW vertex order (bbox.go:35-42 Vertices / AsPolygon).
  */
case class StBoxPolygon(c1: Expression, c2: Expression, c3: Expression, c4: Expression)
    extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def children: Seq[Expression] = Seq(c1, c2, c3, c4)
  override def dataType: DataType = BinaryType
  protected def evalN(v: Array[Any]): Any = {
    val e = Extent(v(0).asInstanceOf[Double], v(1).asInstanceOf[Double],
                   v(2).asInstanceOf[Double], v(3).asInstanceOf[Double])
    Wkb.encode(e.asPolygon)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2), c(3))
}

case class StX(child: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = DoubleType
  protected def evalN(v: Array[Any]): Any = geomOrNull(v(0).asInstanceOf[Array[Byte]]) match {
    case GPoint(p) => p._1
    case _         => null
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StY(child: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = DoubleType
  protected def evalN(v: Array[Any]): Any = geomOrNull(v(0).asInstanceOf[Array[Byte]]) match {
    case GPoint(p) => p._2
    case _         => null
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StGeomType(child: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = StringType
  protected def evalN(v: Array[Any]): Any = geomOrNull(v(0).asInstanceOf[Array[Byte]]) match {
    case null                  => null
    case _: GPoint             => utf8("Point")
    case _: GMultiPoint        => utf8("MultiPoint")
    case _: GLineString        => utf8("LineString")
    case _: GMultiLineString   => utf8("MultiLineString")
    case _: GPolygon           => utf8("Polygon")
    case _: GMultiPolygon      => utf8("MultiPolygon")
    case _: GCollection        => utf8("GeometryCollection")
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

/** bbox of a geometry (reference bbox.go AddGeometry / NewExtentFromGeometry). */
case class StEnvelope(child: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = envStruct
  protected def evalN(v: Array[Any]): Any = {
    val g = geomOrNull(v(0).asInstanceOf[Array[Byte]])
    if (g == null) return null
    Extent.ofGeometry(g) match {
      case Some(e) => row(e.minx, e.miny, e.maxx, e.maxy)
      case None    => null
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

/** all coordinates (reference geom.go:331-406 GetCoordinates). */
case class StDumpPoints(child: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(pointStruct, containsNull = false)
  protected def evalN(v: Array[Any]): Any = {
    val g = geomOrNull(v(0).asInstanceOf[Array[Byte]])
    if (g == null) return null
    new GenericArrayData(coordinates(g).map(p => row(p._1, p._2)).toArray[Any])
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

/** all segments incl. ring-closing edges (reference geom.go:470-546). */
case class StSegmentsOf(child: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(segStruct, containsNull = false)
  protected def evalN(v: Array[Any]): Any = {
    val g = geomOrNull(v(0).asInstanceOf[Array[Byte]])
    if (g == null) return null
    new GenericArrayData(segments(g).map(s => row(s.x1, s.y1, s.x2, s.y2)).toArray[Any])
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StNumPoints(child: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = IntegerType
  protected def evalN(v: Array[Any]): Any = {
    val g = geomOrNull(v(0).asInstanceOf[Array[Byte]])
    if (g == null) null else coordinates(g).length
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

// ---------------------------------------------------------------------------
// point-in-polygon (hitmap semantics) with a per-task decoded-geometry cache
// ---------------------------------------------------------------------------

/** Point-in-polygon with the reference's hitmap semantics (exterior rings
  * border-inclusive, holes border-exclusive, 20-bit point pre-rounding —
  * hitmap/polygon_hitmap.go:90-127). The decoded polygon + hitmap is cached
  * per distinct WKB value (expressions are per-task instances, so the cache
  * is single-threaded); joins against a broadcast polygon side hit the cache
  * nearly always instead of re-parsing WKB per row.
  */
case class StContains(geo: Expression, xe: Expression, ye: Expression)
    extends org.apache.spark.sql.graft.GeomExprStaticRef {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType, DoubleType, DoubleType)
  override def children: Seq[Expression] = Seq(geo, xe, ye)
  override def dataType: DataType = BooleanType
  protected def staticKernel: String = "graft.core.WkbKernels.contains"
  protected def evalN(v: Array[Any]): Any =
    graft.core.WkbKernels.contains(v(0).asInstanceOf[Array[Byte]],
      v(1).asInstanceOf[Double], v(2).asInstanceOf[Double])
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2))
}

/** Raw ray-cast ring containment (reference planar/intersect/ring.go:73-154)
  * against a polygon's exterior ring with explicit border flag.
  */
case class StRingContains(geo: Expression, xe: Expression, ye: Expression,
                          includeBorder: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType, DoubleType, DoubleType, BooleanType)
  override def children: Seq[Expression] = Seq(geo, xe, ye, includeBorder)
  override def dataType: DataType = BooleanType
  override def stateful: Boolean = true

  @transient private var lastBytes: java.nio.ByteBuffer = _
  @transient private var lastRingIn: Ring = _
  @transient private var lastRingEx: Ring = _

  protected def evalN(v: Array[Any]): Any = {
    val bytes = v(0).asInstanceOf[Array[Byte]]
    val incl = v(3).asInstanceOf[Boolean]
    val key = java.nio.ByteBuffer.wrap(bytes)
    if (lastBytes == null || !(key == lastBytes)) {
      val ring = geomOrNull(bytes) match {
        case GPolygon(rs) if rs.nonEmpty && rs.head.length >= 3      => rs.head
        case GLineString(ps) if ps.length >= 3                       => ps
        case GMultiPolygon(mp) if mp.nonEmpty && mp.head.nonEmpty    => mp.head.head
        case _                                                       => null
      }
      if (ring == null) return null
      lastBytes = key
      lastRingIn = Ring.fromPoints(ring, includeBorder = true)
      lastRingEx = Ring.fromPoints(ring, includeBorder = false)
    }
    val r = if (incl) lastRingIn else lastRingEx
    r.containsPoint((v(1).asInstanceOf[Double], v(2).asInstanceOf[Double]))
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2), c(3))
}

// ---------------------------------------------------------------------------
// slippy tiles
// ---------------------------------------------------------------------------

/** (lon, lat, z) → packed cell id (z<<58 | x<<29 | y). */
case class StCellAt(lon: Expression, lat: Expression, z: Expression) extends GeomExprGen {
  override protected def staticKernel: String = "graft.core.CellKernels.cellAt"
  override def inputTypesImpl: Seq[DataType] = Seq(DoubleType, DoubleType, IntegerType)
  override def children: Seq[Expression] = Seq(lon, lat, z)
  override def dataType: DataType = LongType
  protected def evalN(v: Array[Any]): Any =
    Slippy.cellAt(v(2).asInstanceOf[Int], v(0).asInstanceOf[Double], v(1).asInstanceOf[Double])
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2))
}

case class StLon2Tile(lon: Expression, z: Expression) extends GeomExprGen {
  override protected def staticKernel: String = "graft.core.CellKernels.lon2Tile"
  override def inputTypesImpl: Seq[DataType] = Seq(DoubleType, IntegerType)
  override def children: Seq[Expression] = Seq(lon, z)
  override def dataType: DataType = LongType
  protected def evalN(v: Array[Any]): Any =
    Slippy.lon2Num(v(1).asInstanceOf[Int], v(0).asInstanceOf[Double]).toLong
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

case class StLat2Tile(lat: Expression, z: Expression) extends GeomExprGen {
  override protected def staticKernel: String = "graft.core.CellKernels.lat2Tile"
  override def inputTypesImpl: Seq[DataType] = Seq(DoubleType, IntegerType)
  override def children: Seq[Expression] = Seq(lat, z)
  override def dataType: DataType = LongType
  protected def evalN(v: Array[Any]): Any =
    Slippy.lat2Num(v(1).asInstanceOf[Int], v(0).asInstanceOf[Double]).toLong
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

case class StTile2Lon(z: Expression, x: Expression) extends GeomExprGen {
  override protected def staticKernel: String = "graft.core.CellKernels.tile2Lon"
  override def inputTypesImpl: Seq[DataType] = Seq(IntegerType, LongType)
  override def children: Seq[Expression] = Seq(z, x)
  override def dataType: DataType = DoubleType
  protected def evalN(v: Array[Any]): Any =
    Slippy.x2deg(v(0).asInstanceOf[Int], v(1).asInstanceOf[Long].toInt)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

case class StTile2Lat(z: Expression, y: Expression) extends GeomExprGen {
  override protected def staticKernel: String = "graft.core.CellKernels.tile2Lat"
  override def inputTypesImpl: Seq[DataType] = Seq(IntegerType, LongType)
  override def children: Seq[Expression] = Seq(z, y)
  override def dataType: DataType = DoubleType
  protected def evalN(v: Array[Any]): Any =
    Slippy.y2deg(v(0).asInstanceOf[Int], v(1).asInstanceOf[Long].toInt)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

case class StCellZ(cell: Expression) extends GeomExprGen {
  override protected def staticKernel: String = "graft.core.CellKernels.cellZ"
  override def inputTypesImpl: Seq[DataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(cell)
  override def dataType: DataType = IntegerType
  protected def evalN(v: Array[Any]): Any = Slippy.unpackZ(v(0).asInstanceOf[Long])
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StCellX(cell: Expression) extends GeomExprGen {
  override protected def staticKernel: String = "graft.core.CellKernels.cellX"
  override def inputTypesImpl: Seq[DataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(cell)
  override def dataType: DataType = LongType
  protected def evalN(v: Array[Any]): Any = Slippy.unpackX(v(0).asInstanceOf[Long])
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

case class StCellY(cell: Expression) extends GeomExprGen {
  override protected def staticKernel: String = "graft.core.CellKernels.cellY"
  override def inputTypesImpl: Seq[DataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(cell)
  override def dataType: DataType = LongType
  protected def evalN(v: Array[Any]): Any = Slippy.unpackY(v(0).asInstanceOf[Long])
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

/** FamilyAt: ancestor (single) or descendants (2^mag × 2^mag block) —
  * reference tile.go:76-99.
  */
case class StFamilyAt(cell: Expression, zoom: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(LongType, IntegerType)
  override def children: Seq[Expression] = Seq(cell, zoom)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  protected def evalN(v: Array[Any]): Any = {
    val fam = Slippy.familyAt(v(0).asInstanceOf[Long], v(1).asInstanceOf[Int])
    new GenericArrayData(fam.toArray)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

/** tiles covering a lon/lat bbox at z — reference tile.go:111-145 FromBounds. */
case class StTilesForBounds(minLon: Expression, minLat: Expression,
                            maxLon: Expression, maxLat: Expression,
                            z: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(DoubleType, DoubleType, DoubleType, DoubleType, IntegerType)
  override def children: Seq[Expression] = Seq(minLon, minLat, maxLon, maxLat, z)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  protected def evalN(v: Array[Any]): Any = {
    val tiles = Slippy.fromBounds(v(4).asInstanceOf[Int],
      v(0).asInstanceOf[Double], v(1).asInstanceOf[Double],
      v(2).asInstanceOf[Double], v(3).asInstanceOf[Double])
    new GenericArrayData(tiles.toArray)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2), c(3), c(4))
}

/** FromBounds over the EPSG:3857 grid (reference slippy/tile_grid.go
  * FromBounds with the web-mercator native extent) — bounds in meters.
  */
case class StTilesForBounds3857(minX: Expression, minY: Expression,
                                maxX: Expression, maxY: Expression,
                                z: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(DoubleType, DoubleType, DoubleType, DoubleType, IntegerType)
  override def children: Seq[Expression] = Seq(minX, minY, maxX, maxY, z)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  protected def evalN(v: Array[Any]): Any = {
    val tiles = Slippy.fromBounds3857(v(4).asInstanceOf[Int],
      v(0).asInstanceOf[Double], v(1).asInstanceOf[Double],
      v(2).asInstanceOf[Double], v(3).asInstanceOf[Double])
    new GenericArrayData(tiles.toArray)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2), c(3), c(4))
}

/** per-row adaptive cover zoom: the deepest level of
  * `Slippy.coverLevels(zmax)` at which the bbox covers ≤ `cap` cells —
  * bounds a spatial join's per-row replication (a continent-scale bbox
  * coarsens itself instead of exploding to 10^5 point-density cells).
  * Composes the reference's FromBounds grid walk (tile.go:111-145) with
  * the TileMinMaxer idea (tile_grid.go:60-95) of climbing zooms until the
  * geometry fits.
  */
case class StCoverZoom(minLon: Expression, minLat: Expression,
                       maxLon: Expression, maxLat: Expression,
                       zmax: Expression, cap: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType, IntegerType, IntegerType)
  override def children: Seq[Expression] = Seq(minLon, minLat, maxLon, maxLat, zmax, cap)
  override def dataType: DataType = IntegerType
  protected def evalN(v: Array[Any]): Any =
    Slippy.coverZoomFor(v(4).asInstanceOf[Int], v(5).asInstanceOf[Int],
      v(0).asInstanceOf[Double], v(1).asInstanceOf[Double],
      v(2).asInstanceOf[Double], v(3).asInstanceOf[Double])
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2), c(3), c(4), c(5))
}

/** bbox cover cells at EACH of the given zoom levels, concatenated (cells
  * pack their zoom, so levels never collide as join keys). A degenerate
  * point bbox yields the point's ancestor ladder — one cell per level.
  */
case class StCoverAtLevels(minLon: Expression, minLat: Expression,
                           maxLon: Expression, maxLat: Expression,
                           levels: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType, ArrayType(IntegerType))
  override def children: Seq[Expression] = Seq(minLon, minLat, maxLon, maxLat, levels)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  protected def evalN(v: Array[Any]): Any = {
    val lv = v(4).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
    val cells = Slippy.coverAtLevels(lv.toIndexedSeq,
      v(0).asInstanceOf[Double], v(1).asInstanceOf[Double],
      v(2).asInstanceOf[Double], v(3).asInstanceOf[Double])
    new GenericArrayData(cells.toArray)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2), c(3), c(4))
}

/** tile extent in 4326 (reference tile_grid.go:48-58). */
case class StTileEnvelope(cell: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(cell)
  override def dataType: DataType = envStruct
  protected def evalN(v: Array[Any]): Any = {
    val c = v(0).asInstanceOf[Long]
    val e = Slippy.tileExtent4326(Slippy.unpackZ(c), Slippy.unpackX(c).toInt,
      Slippy.unpackY(c).toInt)
    row(e.minx, e.miny, e.maxx, e.maxy)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

// ---------------------------------------------------------------------------
// geometry transforms
// ---------------------------------------------------------------------------

/** Douglas-Peucker (reference douglaspeucker.go + simplify.go dispatch). */
case class StSimplify(geo: Expression, tol: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType, DoubleType)
  override def children: Seq[Expression] = Seq(geo, tol)
  override def dataType: DataType = BinaryType
  protected def evalN(v: Array[Any]): Any = {
    val g = geomOrNull(v(0).asInstanceOf[Array[Byte]])
    if (g == null) return null
    Wkb.encode(Simplify.geometry(g, v(1).asInstanceOf[Double]))
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

/** clip to box (reference clip/clip.go dispatch; polygons ⇒ null, matching
  * ErrUnsupportedGeometry — they go through makevalid).
  */
case class StClip(geo: Expression, c1: Expression, c2: Expression,
                  c3: Expression, c4: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType, DoubleType, DoubleType, DoubleType, DoubleType)
  override def children: Seq[Expression] = Seq(geo, c1, c2, c3, c4)
  override def dataType: DataType = BinaryType
  protected def evalN(v: Array[Any]): Any = {
    val g = geomOrNull(v(0).asInstanceOf[Array[Byte]])
    if (g == null) return null
    val box = Some(Extent(v(1).asInstanceOf[Double], v(2).asInstanceOf[Double],
                          v(3).asInstanceOf[Double], v(4).asInstanceOf[Double]))
    g match {
      case _: GPolygon | _: GMultiPolygon | _: GCollection => null
      case other => Clip.geometry(other, box) match {
        case Some(res) => Wkb.encode(res)
        case None      => null
      }
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2), c(3), c(4))
}

/** winding of the primary point sequence (reference winding.go Orientation,
  * y-up): polygon exterior ring / linestring vertices; -1 CW, 0 colinear,
  * 1 CCW.
  */
case class StWinding(geo: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(geo)
  override def dataType: DataType = IntegerType
  protected def evalN(v: Array[Any]): Any = {
    val g = geomOrNull(v(0).asInstanceOf[Array[Byte]])
    if (g == null) return null
    val pts = g match {
      case GPolygon(rs) if rs.nonEmpty                => rs.head
      case GLineString(ps)                            => ps
      case GMultiPolygon(mp) if mp.nonEmpty && mp.head.nonEmpty => mp.head.head
      case _                                          => return 0
    }
    Winding.ofPoints(pts)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

/** RectifyPolygon (reference winding.go:203-236): exterior CW, holes CCW,
  * colinear rings dropped; colinear exterior ⇒ null.
  */
case class StRectifyPolygon(geo: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(geo)
  override def dataType: DataType = BinaryType
  protected def evalN(v: Array[Any]): Any = {
    val g = geomOrNull(v(0).asInstanceOf[Array[Byte]])
    g match {
      case GPolygon(rs) =>
        Winding.rectifyPolygon(rs) match {
          case Some(fixed) => Wkb.encode(GPolygon(fixed))
          case None        => null
        }
      case GMultiPolygon(mp) =>
        val fixed = mp.flatMap(p => Winding.rectifyPolygon(p))
        Wkb.encode(GMultiPolygon(fixed))
      case _ => null
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

/** reference planar/centriod.go PointsCentriod — quirk preserved. Applied
  * to a polygon's exterior ring (open) or a linestring's points.
  */
case class StCentroidRef(geo: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(geo)
  override def dataType: DataType = pointStruct
  protected def evalN(v: Array[Any]): Any = {
    val g = geomOrNull(v(0).asInstanceOf[Array[Byte]])
    if (g == null) return null
    val pts = g match {
      case GPolygon(rs) if rs.nonEmpty => rs.head
      case GLineString(ps)             => ps
      case GPoint(p)                   => return row(p._1, p._2)
      case _                           => return null
    }
    val (cx, cy) = Planar.pointsCentroidRef(pts)
    row(cx, cy)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

// ---------------------------------------------------------------------------
// scalar planar math (pure doubles — these stay exact across engines)
// ---------------------------------------------------------------------------

/** perpendicular distance of (px,py) to the infinite line (x1,y1)-(x2,y2). */
case class StPerpendicularDistance(a: Expression, b: Expression, c: Expression,
                                   d: Expression, e: Expression, f: Expression)
    extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(DoubleType, DoubleType, DoubleType, DoubleType, DoubleType, DoubleType)
  override def children: Seq[Expression] = Seq(a, b, c, d, e, f)
  override def dataType: DataType = DoubleType
  protected def evalN(v: Array[Any]): Any =
    Planar.perpendicularDistance(
      Seg(v(0).asInstanceOf[Double], v(1).asInstanceOf[Double],
          v(2).asInstanceOf[Double], v(3).asInstanceOf[Double]),
      v(4).asInstanceOf[Double], v(5).asInstanceOf[Double])
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(cs(0), cs(1), cs(2), cs(3), cs(4), cs(5))
}

/** clamped distance of (px,py) to the segment (x1,y1)-(x2,y2). */
case class StDistanceToSegment(a: Expression, b: Expression, c: Expression,
                               d: Expression, e: Expression, f: Expression)
    extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(DoubleType, DoubleType, DoubleType, DoubleType, DoubleType, DoubleType)
  override def children: Seq[Expression] = Seq(a, b, c, d, e, f)
  override def dataType: DataType = DoubleType
  protected def evalN(v: Array[Any]): Any =
    Planar.distanceToLineSegment(
      (v(4).asInstanceOf[Double], v(5).asInstanceOf[Double]),
      (v(0).asInstanceOf[Double], v(1).asInstanceOf[Double]),
      (v(2).asInstanceOf[Double], v(3).asInstanceOf[Double]))
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(cs(0), cs(1), cs(2), cs(3), cs(4), cs(5))
}

/** segment × segment intersection (reference line_intersect.go:141-178). */
case class StSegIntersect(a: Expression, b: Expression, c: Expression, d: Expression,
                          e: Expression, f: Expression, g: Expression, h: Expression)
    extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(DoubleType, DoubleType, DoubleType, DoubleType, DoubleType, DoubleType, DoubleType, DoubleType)
  override def children: Seq[Expression] = Seq(a, b, c, d, e, f, g, h)
  override def dataType: DataType = intersectStruct
  protected def evalN(v: Array[Any]): Any = {
    val ((x, y), ok) = Planar.segmentIntersect(
      Seg(v(0).asInstanceOf[Double], v(1).asInstanceOf[Double],
          v(2).asInstanceOf[Double], v(3).asInstanceOf[Double]),
      Seg(v(4).asInstanceOf[Double], v(5).asInstanceOf[Double],
          v(6).asInstanceOf[Double], v(7).asInstanceOf[Double]))
    row(x, y, ok)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(cs(0), cs(1), cs(2), cs(3), cs(4), cs(5), cs(6), cs(7))
}

/** orientation of 3 points (reference winding.go Orientation, y-up). */
case class StOrient(a: Expression, b: Expression, c: Expression,
                    d: Expression, e: Expression, f: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(DoubleType, DoubleType, DoubleType, DoubleType, DoubleType, DoubleType)
  override def children: Seq[Expression] = Seq(a, b, c, d, e, f)
  override def dataType: DataType = IntegerType
  protected def evalN(v: Array[Any]): Any =
    Winding.ofPoints(Vector(
      (v(0).asInstanceOf[Double], v(1).asInstanceOf[Double]),
      (v(2).asInstanceOf[Double], v(3).asInstanceOf[Double]),
      (v(4).asInstanceOf[Double], v(5).asInstanceOf[Double])))
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(cs(0), cs(1), cs(2), cs(3), cs(4), cs(5))
}
