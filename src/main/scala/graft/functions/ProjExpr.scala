package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

import graft.core.{Geom, Projection, Wkb}

/** Forward map projection for any registered SRID (core/Proj.scala +
  * Projection.forSrid — the reference's Grid{Srid} CRS hook as a column):
  * (srid, lng, lat) → struct(x, y) in the CRS's native units. The SRID is
  * a plan-time constant (one projection lookup per expression instance,
  * not per row); an unknown SRID fails at ANALYSIS time — like the
  * reference's proj.Convert error, and never mid-job on an executor.
  */
case class StProject(lng: Expression, lat: Expression, srid: Int) extends GeomExpr {
  @transient private lazy val proj: Projection = Projection.forSrid(srid).get

  override def checkInputDataTypes(): TypeCheckResult =
    ProjExpr.checkSrid(srid, super.checkInputDataTypes())
  override def inputTypesImpl: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def children: Seq[Expression] = Seq(lng, lat)
  override def dataType: DataType = GeomExpr.pointStruct

  protected def evalN(v: Array[Any]): Any = {
    val (x, y) = proj.forward(v(0).asInstanceOf[Double], v(1).asInstanceOf[Double])
    if (java.lang.Double.isFinite(x) && java.lang.Double.isFinite(y))
      GeomExpr.row(x, y)
    else null // poles under Mercator-family CRSs: no finite map position
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), srid)
}

private[functions] object ProjExpr {
  /** analysis-time SRID validity: the lookup executors will replay must
    * succeed on the driver before the job launches.
    */
  def checkSrid(srid: Int, base: TypeCheckResult): TypeCheckResult =
    if (base.isFailure || Projection.forSrid(srid).isDefined) base
    else TypeCheckResult.TypeCheckFailure(
      s"unsupported SRID $srid (see graft.core.Projection.forSrid)")
}

/** Inverse projection: (srid, x, y) → struct(x = lng, y = lat). */
case class StProjectInv(x: Expression, y: Expression, srid: Int) extends GeomExpr {
  @transient private lazy val proj: Projection = Projection.forSrid(srid).get

  override def checkInputDataTypes(): TypeCheckResult =
    ProjExpr.checkSrid(srid, super.checkInputDataTypes())
  override def inputTypesImpl: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def children: Seq[Expression] = Seq(x, y)
  override def dataType: DataType = GeomExpr.pointStruct

  protected def evalN(v: Array[Any]): Any = {
    val (lon, lat) = proj.inverse(v(0).asInstanceOf[Double], v(1).asInstanceOf[Double])
    if (java.lang.Double.isFinite(lon) && java.lang.Double.isFinite(lat))
      GeomExpr.row(lon, lat)
    else null
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), srid)
}

/** Whole-geometry reprojection (WKB → WKB): the reference's
  * `ApplyToPoints` (utils.go:6-110) composed with the `Grid{Srid}`
  * projection pair — every coordinate runs inverse(fromSrid) → 4326 →
  * forward(toSrid), recursing through collections, ring and vertex order
  * preserved. Both SRIDs resolve at plan time (analysis failure on an
  * unknown code); a geometry with any coordinate that has no finite image
  * (e.g. a pole under a Mercator-family target) maps to NULL rather than
  * a partially-poisoned geometry, matching st_project's scalar rule.
  */
case class StTransform(geo: Expression, fromSrid: Int, toSrid: Int) extends GeomExpr {
  @transient private lazy val from: Projection = Projection.forSrid(fromSrid).get
  @transient private lazy val to: Projection = Projection.forSrid(toSrid).get

  override def checkInputDataTypes(): TypeCheckResult =
    ProjExpr.checkSrid(toSrid, ProjExpr.checkSrid(fromSrid, super.checkInputDataTypes()))
  override def inputTypesImpl: Seq[DataType] = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(geo)
  override def dataType: DataType = BinaryType

  protected def evalN(v: Array[Any]): Any = {
    val g = GeomExpr.geomOrNull(v(0).asInstanceOf[Array[Byte]])
    if (g == null) return null
    var finite = true
    val out = Geom.applyToPoints(g) { p =>
      val (lon, lat) = from.inverse(p._1, p._2)
      val q = to.forward(lon, lat)
      if (!(java.lang.Double.isFinite(q._1) && java.lang.Double.isFinite(q._2)))
        finite = false
      q
    }
    if (finite) Wkb.encode(out) else null
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), fromSrid, toSrid)
}
