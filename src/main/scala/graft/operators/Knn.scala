package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.GeomFunctions._

/** Cell-pruned k-nearest-neighbor join (reference kd-tree kNN semantics,
  * planar/index/kdtree + SURVEY.md §2.13, re-expressed as a distributed
  * two-phase plan):
  *
  *  phase 1 — queries are replicated to their 3×3 cell neighborhood at
  *    zoom `z` (cheap: queries ≪ points), points keep their single cell;
  *    an equi-join on cell + a bounded top-k AGGREGATE (map-side partial:
  *    each map task forwards at most k candidates per query, so hot cells
  *    never concentrate full candidate lists on one reducer) yields the
  *    per-query k nearest candidates.
  *  phase 2 — a query is CERTIFIED exact when its kth candidate distance
  *    is ≤ its distance to the 3×3 block boundary (no point outside the
  *    block can be closer); the rare uncertified queries (sparse regions)
  *    fall back to a broadcast brute-force pass.
  *
  * The result is exactly the true kNN (Euclidean in lon/lat degree space,
  * matching planar.PointDistance2), while the heavy path stays a single
  * shuffle on the cell key. The per-query aggregate frame (≤ k entries per
  * query) is consumed by both the certified branch and the anti-join that
  * finds uncertified queries; the two branches share a byte-identical
  * aggregate subtree, so Spark's ReuseExchange serves both from one
  * shuffle write — no cache()/persist() pinning executor memory.
  * At 10^12 points the phase-1 join shuffles points once by cell; AQE
  * handles hot-cell skew.
  */
object Knn {

  /** pick a grid zoom targeting ~15 points per cell: deep enough that the
    * candidate join stays small, shallow enough that the 3×3 block margin
    * certifies nearly every query.
    */
  def zoomFor(nPoints: Long): Int = {
    val cellsWanted = math.max(1.0, nPoints / 15.0)
    val z = (math.log(cellsWanted) / math.log(4.0)).toInt
    math.max(3, math.min(12, z))
  }

  /** Metadata-only row estimate from the optimizer's statistics — no scan,
    * no job (the old `pts.count()` plan-build pass cost a full extra read
    * of the points table before the query even started). The zoom choice
    * only needs order-of-magnitude accuracy (each z step changes cell
    * population 4×, and results are exact at ANY z), so the optimizer's
    * size-in-bytes estimate divided by the schema row width is plenty.
    */
  def zoomForPlan(points: DataFrame): Int = {
    val stats = points.queryExecution.optimizedPlan.stats
    val rows = stats.rowCount.map(_.toLong).getOrElse {
      val rowBytes = math.max(8, points.schema.map(_.dataType.defaultSize).sum)
      (stats.sizeInBytes / rowBytes).toLong
    }
    zoomFor(math.max(1L, rows))
  }

  /** Multi-level kNN: run the 3×3-block grid join at `z`, then retry the
    * (few) uncertified queries at z−2 (16× larger cells, 4× the margin) —
    * the "secondary ring expansion" of SURVEY §2.13 — before the final
    * brute-force pass. Each level's certified results are exact; the
    * remainder set shrinks geometrically.
    */
  def knnJoinExpanding(queries: DataFrame, points: DataFrame, k: Int, z: Int): DataFrame = {
    val (lvl1, rest1) = knnLevel(queries, points, k, z)
    if (z - 2 >= 2) {
      val (lvl2, rest2) = knnLevel(rest1, points, k, z - 2)
      lvl1.unionByName(lvl2).unionByName(bruteForce(rest2, points, k))
    } else {
      lvl1.unionByName(bruteForce(rest1, points, k))
    }
  }

  /** exact brute force for a (small, broadcast) query set. */
  private def bruteForce(queries: DataFrame, points: DataFrame, k: Int): DataFrame = {
    val d2 = (col("qlon") - col("lon")) * (col("qlon") - col("lon")) +
      (col("qlat") - col("lat")) * (col("qlat") - col("lat"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist2").asc, col("nid").asc)
    points.join(broadcast(queries), col("qid") =!= col("pid"))
      .select(col("qid"), col("pid").as("nid"), d2.as("dist2"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** one grid level: returns (certified exact results, uncertified queries). */
  private def knnLevel(queries: DataFrame, points: DataFrame, k: Int,
                       z: Int): (DataFrame, DataFrame) = {
    val d2 = (col("qlon") - col("lon")) * (col("qlon") - col("lon")) +
      (col("qlat") - col("lat")) * (col("qlat") - col("lat"))
    val q = queries.select(col("qid"), col("qlon"), col("qlat"),
      st_lon2tile(col("qlon"), lit(z)).as("qtx"),
      st_lat2tile(col("qlat"), lit(z)).as("qty"))
    val maxT = (1L << z) - 1
    val qCells = q.select(col("qid"), col("qlon"), col("qlat"), col("qtx"), col("qty"),
        explode(array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
          struct((col("qtx") + dx).as("tx"), (col("qty") + dy).as("ty")))): _*)).as("nb"))
      .filter(col("nb.tx") >= 0 && col("nb.tx") <= maxT &&
              col("nb.ty") >= 0 && col("nb.ty") <= maxT)
      .select(col("qid"), col("qlon"), col("qlat"), col("qtx"), col("qty"),
        col("nb.tx").as("tx"), col("nb.ty").as("ty"))
    val p = points.select(col("pid"), col("lon"), col("lat"),
      st_lon2tile(col("lon"), lit(z)).as("tx"),
      st_lat2tile(col("lat"), lit(z)).as("ty"))
    // one shuffle: candidates → bounded top-k per query, map-side combined
    val agg = qCells.join(p, Seq("tx", "ty"))
      .filter(col("qid") =!= col("pid"))
      .select(col("qid"), col("qlon"), col("qlat"), col("qtx"), col("qty"),
        col("pid").as("nid"), d2.as("dist2"))
      .groupBy(col("qid"), col("qlon"), col("qlat"), col("qtx"), col("qty"))
      .agg(topk_neighbors(col("dist2"), col("nid"), k).as("topk"))
    val blockMinX = st_tile2lon(lit(z), col("qtx") - 1)
    val blockMaxX = st_tile2lon(lit(z), col("qtx") + 2)
    val blockMaxY = st_tile2lat(lit(z), col("qty") - 1)
    val blockMinY = st_tile2lat(lit(z), col("qty") + 2)
    val inf = lit(Double.MaxValue)
    val margin = least(
      when(col("qtx") === 0, inf).otherwise(col("qlon") - blockMinX),
      when(col("qtx") === maxT, inf).otherwise(blockMaxX - col("qlon")),
      when(col("qty") === 0, inf).otherwise(blockMaxY - col("qlat")),
      when(col("qty") === maxT, inf).otherwise(col("qlat") - blockMinY))
    val certified = agg
      .withColumn("certified", size(col("topk")) === k &&
        element_at(col("topk"), k).getField("dist2") <= margin * margin)
    val exactPart = certified.filter(col("certified"))
      .select(col("qid"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("qid"), col("nb.nid").as("nid"), col("nb.dist2").as("dist2"),
        (col("pos") + 1).cast("long").as("rk"))
    val uncertified = queries
      .join(certified.filter(col("certified")).select("qid"), Seq("qid"), "left_anti")
      .select(col("qid"), col("qlon"), col("qlat"))
    (exactPart, uncertified)
  }

  /** queries(qid, lon, lat) × points(pid, lon, lat) → (qid, nid, dist2, rk). */
  def knnJoin(queries: DataFrame, points: DataFrame, k: Int, z: Int): DataFrame =
    knnJoinExpanding(queries, points, k, z)

  /** as `knnJoin` but the grid zoom is derived from plan statistics
    * (metadata-only — no extra scan). */
  def knnJoinAuto(queries: DataFrame, points: DataFrame, k: Int): DataFrame =
    knnJoinExpanding(queries, points, k, zoomForPlan(points))
}
