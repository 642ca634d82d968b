package graft.core

/** Plain static-forwarder surface for Janino-generated code: whole-stage
  * codegen calls these directly (no boxing, no default-arg mangling).
  * Values are identical to the Slippy methods they delegate to.
  */
object CellKernels {
  def cellAt(lon: Double, lat: Double, z: Int): Long = Slippy.cellAt(z, lon, lat)
  def lon2Tile(lon: Double, z: Int): Long = Slippy.lon2Num(z, lon).toLong
  def lat2Tile(lat: Double, z: Int): Long = Slippy.lat2Num(z, lat).toLong
  def tile2Lon(z: Int, x: Long): Double = Slippy.x2deg(z, x.toInt)
  def tile2Lat(z: Int, y: Long): Double = Slippy.y2deg(z, y.toInt)
  def cellZ(cell: Long): Int = Slippy.unpackZ(cell)
  def cellX(cell: Long): Long = Slippy.unpackX(cell)
  def cellY(cell: Long): Long = Slippy.unpackY(cell)
}
