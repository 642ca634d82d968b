package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

import graft.core.Utm

/** UTM forward projection as a scalar expression (WGS84):
  * (lng, lat) → struct(northing, easting, zone_number, zone_letter).
  * Null outside the C..X latitude bands (like the reference's error).
  */
case class StUtmFromLngLat(lng: Expression, lat: Expression) extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def children: Seq[Expression] = Seq(lng, lat)
  override def dataType: DataType = StructType(Seq(
    StructField("northing", DoubleType, false),
    StructField("easting", DoubleType, false),
    StructField("zone_number", IntegerType, false),
    StructField("zone_letter", StringType, false)))

  protected def evalN(v: Array[Any]): Any =
    Utm.fromLngLat(v(0).asInstanceOf[Double], v(1).asInstanceOf[Double],
        Utm.WGS84.copy(natoCompatible = false)) match {
      case Some(c) =>
        GeomExpr.row(c.northing, c.easting, c.zone.number,
          GeomExpr.utf8(c.zone.letter.toString))
      case None => null
    }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1))
}
