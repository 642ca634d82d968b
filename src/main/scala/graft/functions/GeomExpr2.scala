package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core._
import graft.core.Geom._
import GeomExpr._

/** makevalid — constrained-Delaunay polygon repair as a scalar operator:
  * sequential per row, parallelism comes from rows
  * (reference planar/makevalid/makevalid.go:190-235; SURVEY.md §2.7).
  * NaN clip coordinates mean "no clipbox" (the reference's nil-extent-as-
  * universe convention, bbox.go:27-29).
  */
case class StMakeValid(geo: Expression, c1: Expression, c2: Expression,
                       c3: Expression, c4: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] =
    Seq(BinaryType, DoubleType, DoubleType, DoubleType, DoubleType)
  override def children: Seq[Expression] = Seq(geo, c1, c2, c3, c4)
  override def dataType: DataType = BinaryType

  override protected def evalN(v: Array[Any]): Any = {
    val ds = (1 to 4).map(i => v(i).asInstanceOf[Double])
    val clip =
      if (ds.exists(_.isNaN)) None
      else Some(Extent(ds(0), ds(1), ds(2), ds(3)))
    val g = geomOrNull(v(0).asInstanceOf[Array[Byte]])
    if (g == null) return null
    try MakeValid.geometry(g, clip) match {
      case Some(res) => Wkb.encode(res)
      case None      => null
    } catch { case _: Exception => null }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2), c(3), c(4))
}

/** project geometry into tile pixel space (reference mvt/prepare.go). */
case class StPrepareTile(geo: Expression, cell: Expression)
    extends org.apache.spark.sql.graft.GeomExprStaticRef {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType, LongType)
  override def children: Seq[Expression] = Seq(geo, cell)
  override def dataType: DataType = BinaryType
  protected def staticKernel: String = "graft.core.WkbKernels.prepareTile"
  protected def evalN(v: Array[Any]): Any =
    graft.core.WkbKernels.prepareTile(v(0).asInstanceOf[Array[Byte]], v(1).asInstanceOf[Long])
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0), c(1))
}

/** MVT command stream of a tile-space geometry (reference mvt/feature.go):
  * struct(commands array<long> of uint32 values, geom_type int).
  */
case class StMvtGeometry(geo: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(geo)
  override def dataType: DataType = StructType(Seq(
    StructField("commands", ArrayType(LongType, containsNull = false), false),
    StructField("geom_type", IntegerType, false)))
  protected def evalN(v: Array[Any]): Any = {
    val g = geomOrNull(v(0).asInstanceOf[Array[Byte]])
    if (g == null) return null
    val (cmds, tpe) = Mvt.encodeGeometryRaw(g)
    row(new GenericArrayData(cmds), tpe)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

/** tile extent in web-mercator meters (reference slippy/tile_grid.go:96-108
  * FromNative/Extent for the 3857 grid): struct(minx,miny,maxx,maxy).
  */
case class StTileExtent3857(z: Expression, x: Expression, y: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(IntegerType, LongType, LongType)
  override def children: Seq[Expression] = Seq(z, x, y)
  override def dataType: DataType = StructType(Seq(
    StructField("minx", DoubleType, false), StructField("miny", DoubleType, false),
    StructField("maxx", DoubleType, false), StructField("maxy", DoubleType, false)))
  protected def evalN(v: Array[Any]): Any = {
    val e = Slippy.tileExtent3857(v(0).asInstanceOf[Int],
      v(1).asInstanceOf[Long].toInt, v(2).asInstanceOf[Long].toInt)
    row(e.minx, e.miny, e.maxx, e.maxy)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2))
}

/** PrepareGeo against an explicit native-unit tile extent (reference
  * mvt/prepare.go:13-78, the cmd/main.go:229 call shape) — unlike
  * StPrepareTile this takes the extent in meters/degrees directly, as the
  * 3857 pipeline needs.
  */
case class StPrepareExtent(geo: Expression, minx: Expression, miny: Expression,
                           maxx: Expression, maxy: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] =
    Seq(BinaryType, DoubleType, DoubleType, DoubleType, DoubleType)
  override def children: Seq[Expression] = Seq(geo, minx, miny, maxx, maxy)
  override def dataType: DataType = BinaryType
  protected def evalN(v: Array[Any]): Any = {
    val g = geomOrNull(v(0).asInstanceOf[Array[Byte]])
    if (g == null) return null
    val ext = Extent(v(1).asInstanceOf[Double], v(2).asInstanceOf[Double],
      v(3).asInstanceOf[Double], v(4).asInstanceOf[Double])
    Wkb.encode(Mvt.prepareGeo(g, ext))
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2), c(3), c(4))
}

/** The FUSED cmd/main.go tile pipeline (cmd/main.go:110-280) as one scalar
  * kernel: tile extent → 1-px clipRegion → DP simplify at the pixel span →
  * makevalid → PrepareGeo(4096px) → MVT command stream, with ONE WKB
  * decode and ZERO intermediate encodes. Bit-identical to the five-stage
  * expression chain (WKB round-trips are exact), but ~10× less allocation
  * churn per row — the chain spent most of its time re-encoding/decoding
  * WKB and boxing rows between CodegenFallback stages, which is also the
  * part that scales worst across threads (allocator pressure).
  * Returns struct(commands array<long>, geom_type int); null on null/
  * unparseable input or irreparable geometry, exactly like the chain.
  */
case class StMvtPipeline(geo: Expression, z: Expression,
                         x: Expression, y: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] =
    Seq(BinaryType, IntegerType, LongType, LongType)
  override def children: Seq[Expression] = Seq(geo, z, x, y)
  override def dataType: DataType = StructType(Seq(
    StructField("commands", ArrayType(LongType, containsNull = false), false),
    StructField("geom_type", IntegerType, false)))
  protected def evalN(v: Array[Any]): Any = {
    val g = geomOrNull(v(0).asInstanceOf[Array[Byte]])
    if (g == null) return null
    val ext = Slippy.tileExtent3857(v(1).asInstanceOf[Int],
      v(2).asInstanceOf[Long].toInt, v(3).asInstanceOf[Long].toInt)
    val webs = (ext.maxx - ext.minx) / 4096.0
    val simp = Simplify.geometry(g, webs)
    val clip = Extent(ext.minx - webs, ext.miny - webs, ext.maxx + webs, ext.maxy + webs)
    val fixed =
      try MakeValid.geometry(simp, Some(clip)) match {
        case Some(res) => res
        case None      => return null
      } catch { case _: Exception => return null }
    val prep = Mvt.prepareGeo(fixed, ext)
    val (cmds, tpe) = Mvt.encodeGeometryRaw(prep)
    row(new GenericArrayData(cmds), tpe)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2), c(3))
}

/** WKB → GeoJSON text (reference encoding/geojson). */
case class StAsGeoJson(geo: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(geo)
  override def dataType: DataType = StringType
  protected def evalN(v: Array[Any]): Any = {
    val g = geomOrNull(v(0).asInstanceOf[Array[Byte]])
    if (g == null) null else utf8(GeoJson.encode(g))
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}

/** GeoJSON text → WKB (null on parse failure). */
case class StGeomFromGeoJson(child: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  protected def evalN(v: Array[Any]): Any =
    try Wkb.encode(GeoJson.decode(v(0).asInstanceOf[UTF8String].toString))
    catch { case _: Exception => null }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c(0))
}
