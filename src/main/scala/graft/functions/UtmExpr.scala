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

/** UTM inverse projection as a scalar expression (WGS84):
  * (northing, easting, zone_number, zone_letter) → struct(lng, lat).
  * Null for invalid zones — mirrors Utm.toLngLat (reference utm.go
  * ToLngLat with the d6·720 quirk preserved).
  */
case class StLngLatFromUtm(northing: Expression, easting: Expression,
                           zoneNumber: Expression, zoneLetter: Expression)
    extends GeomExpr {
  override def inputTypesImpl: Seq[DataType] =
    Seq(DoubleType, DoubleType, IntegerType, StringType)
  override def children: Seq[Expression] = Seq(northing, easting, zoneNumber, zoneLetter)
  override def dataType: DataType = StructType(Seq(
    StructField("lng", DoubleType, false),
    StructField("lat", DoubleType, false)))

  protected def evalN(v: Array[Any]): Any = {
    val letter = v(3).toString
    if (letter.length != 1) return null
    val zone = Utm.Zone(v(2).asInstanceOf[Int], letter.charAt(0))
    val coord = Utm.Coord(v(0).asInstanceOf[Double], v(1).asInstanceOf[Double], zone)
    Utm.toLngLat(coord) match {
      case Some((lng, lat)) => GeomExpr.row(lng, lat)
      case None             => null
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(c(0), c(1), c(2), c(3))
}
