package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GeomFunctions._

/** Distributed point-in-polygon join for the case the broadcast form
  * (q03's plan) cannot serve: BOTH sides at cluster scale, so neither
  * fits on an executor. Reference semantics are planar.Ring containment
  * (ring.go ContainsPoint via the hitmap rules) exactly as the broadcast
  * path uses them — only the join strategy changes.
  *
  * Plan shape (the 100 TB path):
  *   - points key by their single slippy cell at zoom `z` (map-only);
  *   - polygons explode to the cell cover of their bbox at the same `z`
  *     (map-only; `FromBounds` semantics, tile.go:118);
  *   - ONE shuffle join on the packed cell id — sort-merge or shuffled-
  *     hash as Catalyst picks, AQE handles cell skew (coastal cities) by
  *     splitting oversized partitions;
  *   - the exact `st_contains` predicate filters the per-cell candidate
  *     pairs.
  *
  * No dedupe is needed: a point lies in exactly one z-cell and a
  * polygon's cover lists each cell once, so a (point, polygon) pair can
  * meet in at most one cell.
  *
  * Choosing `z`: deeper cells mean fewer candidate pairs per cell but
  * replicate each polygon onto more cells (its bbox cover grows 4× per
  * step once cells are smaller than the polygon). The sweet spot keys
  * the grid off POINT density — `Knn.zoomForPlan` (bounded footer
  * sampling, never a scan) targets ~15 points/cell, which keeps the
  * per-cell candidate work O(polys overlapping the cell) — and lets
  * polygon replication land where it must: a polygon spanning many
  * point-dense cells genuinely has that many cells of work to do.
  */
object SpatialJoin {

  /** `points(lonCol, latCol)` × `polys(minxCol..maxyCol, polyCol)` →
    * all (point, polygon) rows where the polygon contains the point.
    * Output columns: every `points` column, then every `polys` column
    * except the bbox (the bbox is an index artifact, not a result).
    * `z < 0` (default) derives the zoom from the points' parquet
    * footers via `Knn.zoomForPlan`.
    */
  def pipJoin(points: DataFrame, lonCol: String, latCol: String,
              polys: DataFrame, polyCol: String,
              minxCol: String = "minx", minyCol: String = "miny",
              maxxCol: String = "maxx", maxyCol: String = "maxy",
              z: Int = -1): DataFrame = {
    val zz = if (z >= 0) z else Knn.zoomForPlan(points)
    val ptCols = points.columns.map(col).toSeq
    val polyOut = polys.columns.filterNot(
      Set(minxCol, minyCol, maxxCol, maxyCol).contains).map(col).toSeq
    val pts = points.withColumn("__cell",
      st_cell_at(col(lonCol), col(latCol), lit(zz)))
    val pol = polys.withColumn("__cell", explode(
      st_tiles_for_bounds(col(minxCol), col(minyCol), col(maxxCol), col(maxyCol), lit(zz))))
    pts.join(pol, Seq("__cell"), "inner")
      .filter(st_contains(col(polyCol), col(lonCol), col(latCol)))
      .select(ptCols ++ polyOut: _*)
  }
}
