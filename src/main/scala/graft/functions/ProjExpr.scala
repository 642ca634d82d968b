package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

import graft.core.Projection

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
