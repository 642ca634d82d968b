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

  /** Within-distance join (range join): all (left, right) pairs with
    * Euclidean degree distance ≤ `radius` (planar.PointDistance metric,
    * the same one `Knn` certifies against). Neither side broadcast:
    *
    *   - right points key by their single cell;
    *   - left points replicate to the cell COVER OF THEIR DISC BBOX
    *     (lon±r, lat±r) — exact at any zoom and any latitude, unlike a
    *     fixed 3×3 neighborhood (mercator cells shrink in degree height
    *     toward the poles);
    *   - one shuffle join on the cell, exact distance filter.
    *
    * Pair-unique without a dedupe: the right point owns ONE cell and the
    * left cover lists each cell once. Default zoom is the coarser of the
    * density-derived zoom and the radius bound (cell width ≥ radius keeps
    * a disc cover at ≤ ~9 cells), so replication stays O(1) per row.
    * Output: left columns, right columns, `dist2` (squared distance —
    * callers needing the metric take sqrt once, not per comparison).
    * Column names must not collide across sides.
    */
  def distanceJoin(left: DataFrame, lonL: String, latL: String,
                   right: DataFrame, lonR: String, latR: String,
                   radius: Double, z: Int = -1): DataFrame = {
    require(radius >= 0, s"radius must be >= 0, got $radius")
    val shared = left.columns.toSet intersect right.columns.toSet
    require(shared.isEmpty, s"column names collide across sides: $shared")
    val radiusZ =
      if (radius <= 0) 16
      else math.min(16, math.max(0, math.floor(
        math.log(360.0 / radius) / math.log(2.0)).toInt))
    val zz = if (z >= 0) z else math.min(Knn.zoomForPlan(right), radiusZ)
    val r = right.withColumn("__cell",
      st_cell_at(col(lonR), col(latR), lit(zz)))
    val l = left.withColumn("__cell", explode(st_tiles_for_bounds(
      col(lonL) - radius, col(latL) - radius,
      col(lonL) + radius, col(latL) + radius, lit(zz))))
    val d2 = (col(lonL) - col(lonR)) * (col(lonL) - col(lonR)) +
      (col(latL) - col(latR)) * (col(latL) - col(latR))
    l.join(r, Seq("__cell"), "inner")
      .withColumn("dist2", d2)
      .filter(col("dist2") <= lit(radius * radius))
      .select((left.columns.map(col) ++ right.columns.map(col) :+ col("dist2")).toIndexedSeq: _*)
  }

  /** Extent (bbox-overlap) join: all (a, b) pairs whose closed-interval
    * boxes intersect. Both sides explode to their cell covers and meet
    * on the cell — which means an overlapping pair can meet in MANY
    * cells. Instead of a distinct (a whole extra shuffle at 10¹² rows),
    * each pair elects the REPORTING CELL — the cell of the intersection
    * rectangle's north-west corner `(max of minxes, min of maxys)`. That
    * corner lies inside both boxes, so its cell is in both covers and
    * the pair meets there exactly once; every other meeting is dropped
    * map-side by a cheap predicate. One shuffle, no dedupe exchange.
    * Output: a's columns then b's columns (names must not collide).
    */
  def extentJoin(a: DataFrame, aMinx: String, aMiny: String, aMaxx: String, aMaxy: String,
                 b: DataFrame, bMinx: String, bMiny: String, bMaxx: String, bMaxy: String,
                 z: Int): DataFrame = {
    val shared = a.columns.toSet intersect b.columns.toSet
    require(shared.isEmpty, s"column names collide across sides: $shared")
    val ea = a.withColumn("__cell", explode(
      st_tiles_for_bounds(col(aMinx), col(aMiny), col(aMaxx), col(aMaxy), lit(z))))
    val eb = b.withColumn("__cell", explode(
      st_tiles_for_bounds(col(bMinx), col(bMiny), col(bMaxx), col(bMaxy), lit(z))))
    val overlap =
      col(aMinx) <= col(bMaxx) && col(bMinx) <= col(aMaxx) &&
      col(aMiny) <= col(bMaxy) && col(bMiny) <= col(aMaxy)
    val reportingCell = st_cell_at(
      greatest(col(aMinx), col(bMinx)), least(col(aMaxy), col(bMaxy)), lit(z))
    ea.join(eb, Seq("__cell"), "inner")
      .filter(overlap && col("__cell") === reportingCell)
      .select((a.columns.map(col) ++ b.columns.map(col)).toIndexedSeq: _*)
  }
}
