package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.GeomFunctions._

/** Cell-pruned k-nearest-neighbor join (reference kd-tree kNN semantics,
  * planar/index/kdtree + SURVEY.md §2.13, re-expressed as a distributed
  * two-phase plan):
  *
  *  phase 1 — queries are replicated to their 3×3 cell neighborhood at
  *    zoom `z` (cheap: queries ≪ points), points keep their single cell;
  *    an equi-join on cell + window top-k yields candidate neighbors.
  *  phase 2 — a query is CERTIFIED exact when its kth candidate distance
  *    is ≤ its distance to the 3×3 block boundary (no point outside the
  *    block can be closer); the rare uncertified queries (sparse regions)
  *    fall back to a broadcast brute-force pass.
  *
  * The result is exactly the true kNN (Euclidean in lon/lat degree space,
  * matching planar.PointDistance2), while the heavy path stays a single
  * shuffle on the cell key. At 10^12 points the phase-1 join shuffles
  * points once by cell; AQE handles hot-cell skew.
  */
object Knn {

  /** queries(qid, lon, lat) × points(pid, lon, lat) → (qid, nid, dist2, rk). */
  def knnJoin(queries: DataFrame, points: DataFrame, k: Int, z: Int): DataFrame = {
    val d2: Column =
      (col("qlon") - col("lon")) * (col("qlon") - col("lon")) +
        (col("qlat") - col("lat")) * (col("qlat") - col("lat"))

    val q = queries.select(col("qid"), col("qlon"), col("qlat"),
      st_lon2tile(col("qlon"), lit(z)).as("qtx"),
      st_lat2tile(col("qlat"), lit(z)).as("qty"))

    val maxT = (1L << z) - 1

    // queries replicated to the 3×3 neighborhood (clamped at world edges)
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

    val w = Window.partitionBy(col("qid")).orderBy(col("dist2").asc, col("nid").asc)

    val phase1 = qCells.join(p, Seq("tx", "ty"))
      .filter(col("qid") =!= col("pid"))
      .select(col("qid"), col("qlon"), col("qlat"), col("qtx"), col("qty"),
        col("pid").as("nid"), d2.as("dist2"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)

    // certification: margin = min distance from query to its 3×3 block
    // boundary; world edges are unbounded (no points can exist beyond)
    val blockMinX = st_tile2lon(lit(z), col("qtx") - 1)
    val blockMaxX = st_tile2lon(lit(z), col("qtx") + 2)
    val blockMaxY = st_tile2lat(lit(z), col("qty") - 1) // north edge
    val blockMinY = st_tile2lat(lit(z), col("qty") + 2) // south edge
    val inf = lit(Double.MaxValue)
    val margin = least(
      when(col("qtx") === 0, inf).otherwise(col("qlon") - blockMinX),
      when(col("qtx") === maxT, inf).otherwise(blockMaxX - col("qlon")),
      when(col("qty") === 0, inf).otherwise(blockMaxY - col("qlat")),
      when(col("qty") === maxT, inf).otherwise(col("qlat") - blockMinY))

    val perQuery = phase1.groupBy(col("qid"))
      .agg(max(col("dist2")).as("kth_dist2"), count(lit(1)).as("n_cand"))
    val certification = q.join(perQuery, Seq("qid"), "left")
      .select(col("qid"), col("qlon"), col("qlat"),
        (col("n_cand").isNotNull && col("n_cand") === k &&
          col("kth_dist2") <= margin * margin).as("certified"))

    val certifiedIds = certification.filter(col("certified"))
    val uncertified = certification.filter(!col("certified") || col("certified").isNull)
      .select(col("qid"), col("qlon"), col("qlat"))

    val exactPart = phase1.join(certifiedIds.select("qid"), Seq("qid"), "left_semi")
      .select(col("qid"), col("nid"), col("dist2"), col("rk").cast("long").as("rk"))

    // fallback: brute force for the few uncertified queries
    val fallback = points.join(broadcast(uncertified), col("qid") =!= col("pid"))
      .select(col("qid"), col("pid").as("nid"), d2.as("dist2"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)

    exactPart.unionByName(fallback)
  }
}
