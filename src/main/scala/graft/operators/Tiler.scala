package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GeomFunctions._

/** Raster↔vector tiler: assigns geometries to the slippy tiles they
  * overlap (reference slippy.FromBounds over the geometry envelope,
  * tile.go:111-145) and joins vector features to raster media references
  * addressed by tile.
  *
  * Scale shape: envelope + tile explosion are per-row expressions (no
  * shuffle); the groupBy(tile) / join(tile) shuffles on the packed long
  * cell id, which also sorts in (z, x, y) reference order. Multi-zoom
  * output is one pass via st_family_at.
  */
object Tiler {

  /** geometries(id, geom WKB) → one row per (id, cell) covering the
    * geometry envelope at zoom z. `srid` picks the grid: 4326 (lon/lat
    * degrees, the docs pipeline) or 3857 (web-mercator meters).
    */
  def assignTiles(geoms: DataFrame, idCol: String, z: Int, srid: Int = 4326): DataFrame = {
    // no env-isNotNull filter (round 7, measured): st_tiles_for_bounds is
    // null-intolerant, so a null envelope yields a null cover and explode()
    // drops the row — same output, and the filter's presence made Catalyst
    // evaluate the whole upstream geometry expression TWICE per row (once
    // in the collapsed filter, once in the explode input projection)
    val env = geoms
      .withColumn("env", st_envelope(col("geom")))
    val tiles =
      if (srid == 3857)
        st_tiles_for_bounds_3857(col("env.minx"), col("env.miny"),
          col("env.maxx"), col("env.maxy"), lit(z))
      else
        st_tiles_for_bounds(col("env.minx"), col("env.miny"),
          col("env.maxx"), col("env.maxy"), lit(z))
    env.select(col(idCol), explode(tiles).as("cell"))
  }

  /** per-tile feature counts rolled up across several zooms in one pass:
    * base assignment at the deepest zoom, ancestors via st_family_at.
    */
  def multiZoomCounts(geoms: DataFrame, idCol: String, zooms: Seq[Int]): DataFrame = {
    val deepest = zooms.max
    val base = assignTiles(geoms, idCol, deepest)
    val perZoom = zooms.map { zz =>
      base.select(col(idCol),
        element_at(st_family_at(col("cell"), lit(zz)), 1).as("cell"))
        .distinct() // a geometry may span several children of one ancestor
    }
    perZoom.reduce(_ unionByName _)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_features"))
      .select(st_cell_z(col("cell")).as("z"), st_cell_x(col("cell")).as("x"),
        st_cell_y(col("cell")).as("y"), col("n_features"))
  }

  /** Full MVT tile sink: geometries → per-tile protobuf bytes.
    * Pipeline: envelope tile assignment (explode) → per-row tile-space
    * projection + command-stream encode (scalar expressions, codegen
    * pipeline, no shuffle) → ONE shuffle grouping by the packed cell id →
    * layer/tile assembly per group. Emits (z, x, y, mvt binary).
    */
  /** shared map-side sink front: inline cell assignment (explode carries
    * the geometry column — the round-2 assignTiles ⋈ geoms form evaluated
    * the input twice and paid a join shuffle for nothing), tile-space
    * projection, command-stream encode. Emits (cell, …, mvt struct); all
    * per-row expressions, no shuffle.
    */
  private def mvtPrep(geoms: DataFrame, z: Int, srid: Int): DataFrame = {
    // same as assignTiles: explode(null cover) drops null-envelope rows;
    // the former filter doubled the upstream makevalid+parse evaluation
    val env = geoms
      .withColumn("env", st_envelope(col("geom")))
    val tiles =
      if (srid == 3857)
        st_tiles_for_bounds_3857(col("env.minx"), col("env.miny"),
          col("env.maxx"), col("env.maxy"), lit(z))
      else
        st_tiles_for_bounds(col("env.minx"), col("env.miny"),
          col("env.maxx"), col("env.maxy"), lit(z))
    val withCell = env.withColumn("cell", explode(tiles))
    val prepped =
      if (srid == 3857)
        withCell
          .withColumn("te", st_tile_extent_3857(st_cell_z(col("cell")),
            st_cell_x(col("cell")), st_cell_y(col("cell"))))
          .withColumn("prep", st_prepare_extent(col("geom"),
            col("te.minx"), col("te.miny"), col("te.maxx"), col("te.maxy")))
      else
        withCell.withColumn("prep", st_prepare_tile(col("geom"), col("cell")))
    prepped.withColumn("mvt", st_mvt_geometry(col("prep")))
  }

  def mvtTiles(spark: org.apache.spark.sql.SparkSession, geoms: DataFrame,
               idCol: String, z: Int, layerName: String, srid: Int = 4326,
               propCols: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    import graft.core.{MvtTile, Slippy}
    val assigned = mvtPrep(geoms, z, srid)
      .select(Seq(col("cell"), col(idCol).cast("string").as("fid"),
        col("mvt.commands").as("commands"), col("mvt.geom_type").as("gtype")) ++
        propCols.map(col): _*)
    // DETERMINISTIC + STREAMING tile assembly (round-3): the round-2
    // groupByKey/mapGroups form assembled features in shuffle arrival
    // order, so re-running the sink could produce byte-different (though
    // semantically equal) tiles — unacceptable for a byte-level gate and
    // for exact checkpoint resume. Features are now shuffled by cell and
    // SORTED WITHIN PARTITIONS by (cell, fid): a single forward walk per
    // partition groups consecutive rows of one tile and feeds them to the
    // streaming layer encoder — per-tile memory stays bounded at the
    // output bytes + key/value maps (never the feature list), and the
    // per-feature heavy work (projection + command encode) happened
    // map-side before the shuffle. Sort-based grouping replaces the hash
    // group's in-memory map with spillable sort machinery — the standard
    // 100 TB shape.
    // Extra property columns ride the same shuffle as typed tag values
    // (MvtTile.TagValue.of per the Spark column type — string/int/double/
    // bool/…, reference layer.go:133-190); "fid" stays the first tag, so
    // with propCols = Nil the tile bytes are unchanged. NULL props are
    // dropped per-feature like the reference drops nil tags.
    val propNames = propCols.toIndexedSeq
    val nFixed = 4 // cell, fid, commands, gtype
    assigned
      .repartition(col("cell"))
      .sortWithinPartitions(col("cell"), col("fid"))
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(Int, Long, Long, Array[Byte])] {
          def hasNext: Boolean = buf.hasNext
          def next(): (Int, Long, Long, Array[Byte]) = {
            val cell = buf.head.getLong(0)
            var i = 0L
            val featIt = new Iterator[MvtTile.Feature] {
              def hasNext: Boolean = buf.hasNext && buf.head.getLong(0) == cell
              def next(): MvtTile.Feature = {
                val r = buf.next()
                i += 1
                // zero-copy: the row holds the command longs in a primitive
                // array (ArraySeq.ofLong) — rewrap instead of boxing a copy
                // (the round-3 micro-pass invariant, kept on the Row path)
                val cmds: IndexedSeq[Long] = r.getSeq[Long](2) match {
                  case as: scala.collection.immutable.ArraySeq[Long] => as
                  case other => other.toIndexedSeq
                }
                val props = Vector.newBuilder[(String, MvtTile.TagValue)]
                props += (("fid", MvtTile.TagValue.VString(r.getString(1))))
                var p = 0
                while (p < propNames.length) {
                  val v = r.get(nFixed + p)
                  if (v != null) props += ((propNames(p), MvtTile.TagValue.of(v)))
                  p += 1
                }
                MvtTile.Feature(i, r.getInt(3), cmds, props.result())
              }
            }
            val layerBytes = MvtTile.encodeLayerStream(layerName, featIt)
            val bytes = MvtTile.encodeTileFromLayerBytes(Vector(layerBytes))
            (Slippy.unpackZ(cell), Slippy.unpackX(cell), Slippy.unpackY(cell), bytes)
          }
        }
      }
      .toDF("z", "x", "y", "mvt")
  }

  /** Multi-LAYER MVT tile sink (reference tile.go: a Tile holds repeated
    * Layer messages): same deterministic streaming shape as `mvtTiles`,
    * with `layerCol` naming each feature's layer. One shuffle on the
    * packed cell, in-partition sort by (cell, layer, fid): a forward walk
    * emits one tile per cell, streaming each consecutive layer run
    * through the layer encoder and framing the finished layers into the
    * tile — layers appear in layer-name order (deterministic bytes),
    * per-tile memory stays bounded at the output bytes + one layer's
    * key/value maps.
    */
  def mvtTilesLayered(spark: org.apache.spark.sql.SparkSession, geoms: DataFrame,
                      idCol: String, z: Int, layerCol: String,
                      srid: Int = 4326): DataFrame = {
    import spark.implicits._
    import graft.core.{MvtTile, Slippy}
    mvtPrep(geoms, z, srid)
      .select(col("cell"), col(layerCol).cast("string").as("layer"),
        col(idCol).cast("string").as("fid"),
        col("mvt.commands").as("commands"), col("mvt.geom_type").as("gtype"))
      .repartition(col("cell"))
      .sortWithinPartitions(col("cell"), col("layer"), col("fid"))
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(Int, Long, Long, Array[Byte])] {
          def hasNext: Boolean = buf.hasNext
          def next(): (Int, Long, Long, Array[Byte]) = {
            val cell = buf.head.getLong(0)
            val layers = Vector.newBuilder[Array[Byte]]
            while (buf.hasNext && buf.head.getLong(0) == cell) {
              val layerName = buf.head.getString(1)
              var i = 0L
              val featIt = new Iterator[MvtTile.Feature] {
                def hasNext: Boolean = buf.hasNext &&
                  buf.head.getLong(0) == cell && buf.head.getString(1) == layerName
                def next(): MvtTile.Feature = {
                  val r = buf.next()
                  i += 1
                  val cmds: IndexedSeq[Long] = r.getSeq[Long](3) match {
                    case as: scala.collection.immutable.ArraySeq[Long] => as
                    case other => other.toIndexedSeq
                  }
                  MvtTile.Feature(i, r.getInt(4), cmds,
                    Vector(("fid", MvtTile.TagValue.VString(r.getString(2)))))
                }
              }
              layers += MvtTile.encodeLayerStream(layerName, featIt)
            }
            val bytes = MvtTile.encodeTileFromLayerBytes(layers.result())
            (Slippy.unpackZ(cell), Slippy.unpackX(cell), Slippy.unpackY(cell), bytes)
          }
        }
      }
      .toDF("z", "x", "y", "mvt")
  }

  /** Rasterize: points → per-tile pixel occupancy at `res`×`res` pixels per
    * z-tile. Pixel math is the slippy projection carried 8 more zoom levels
    * (res=256 ⇒ a z pixel IS a z+8 tile), so the whole stage is the same
    * map-only vectorized cell encode as tile assignment — no shuffle until
    * the occupancy groupBy on (cell, py, px).
    */
  def rasterizePoints(pts: DataFrame, z: Int, res: Int = 256): DataFrame = {
    require(res > 0 && (res & (res - 1)) == 0, "res must be a power of two")
    val extraZ = (math.log(res.toDouble) / math.log(2.0)).round.toInt
    val fine = st_cell_at(col("lon"), col("lat"), lit(z + extraZ))
    pts
      .withColumn("cell", st_cell_at(col("lon"), col("lat"), lit(z)))
      .withColumn("px", (st_cell_x(fine) - st_cell_x(col("cell")) * res).cast("int"))
      .withColumn("py", (st_cell_y(fine) - st_cell_y(col("cell")) * res).cast("int"))
      .groupBy(col("cell"), col("py"), col("px"))
      .agg(count(lit(1)).as("n"))
  }

  /** Vectorize step 1 — horizontal runs: merge adjacent occupied pixels of
    * one tile row into [px0, px1] spans (gaps-and-islands: px − row_number
    * is constant within a run). One window + one groupBy, both on the
    * (cell, py) key — integer arithmetic, exactly mirrorable in SQL.
    */
  def rasterRuns(raster: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell"), col("py")).orderBy(col("px").asc)
    raster
      .withColumn("isl", col("px") - row_number().over(w))
      .groupBy(col("cell"), col("py"), col("isl"))
      .agg(min(col("px")).as("px0"), max(col("px")).as("px1"),
        sum(col("n")).as("n_pts"))
      .drop("isl")
  }

  /** Vectorize step 2 — greedy vertical merge of identical [px0, px1] runs
    * on consecutive rows into rectangles, then rectangles → pixel-space
    * polygons (x0, y0, x1, y1 in the tile's res-pixel grid). Per-tile
    * sequential kernel over sorted runs (embarrassingly parallel across
    * tiles, like the makevalid kernel).
    */
  def vectorizeRaster(spark: org.apache.spark.sql.SparkSession,
                      runs: DataFrame): DataFrame = {
    import spark.implicits._
    runs.select(col("cell"), col("py"),
        col("px0").cast("long"), col("px1").cast("long"))
      .as[(Long, Int, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (cell, it) =>
        val rs = it.map { case (_, py, p0, p1) => (py, p0, p1) }.toArray
          .sortBy { case (py, p0, _) => (py, p0) }
        // open rectangles keyed by (px0, px1): extend when the next row
        // repeats the exact span, else close
        val open = scala.collection.mutable.LinkedHashMap[(Long, Long), (Int, Int)]()
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Int, Long, Int)]()
        var row = Int.MinValue
        def closeStale(currentRow: Int): Unit = {
          val stale = open.filter { case (_, (_, last)) => last < currentRow - 1 }
          stale.foreach { case (k @ (p0, p1), (y0, y1)) =>
            out += ((cell, p0, y0, p1, y1)); open.remove(k)
          }
        }
        for ((py, p0, p1) <- rs) {
          if (py != row) { closeStale(py); row = py }
          open.get((p0, p1)) match {
            case Some((y0, _)) => open((p0, p1)) = (y0, py)
            case None          => open((p0, p1)) = (py, py)
          }
        }
        open.foreach { case ((p0, p1), (y0, y1)) => out += ((cell, p0, y0, p1, y1)) }
        out.iterator
      }
      .toDF("cell", "x0", "y0", "x1", "y1")
  }

  /** Raster↔vector join: vector points keyed by their z15 cell meet media
    * spans keyed by the tile encoded in their media_ref
    * ("media://tile/{z}/{x}/{y}#{n}").
    */
  def rasterVectorJoin(vectorPts: DataFrame, mediaRefs: DataFrame): DataFrame = {
    val vec = vectorPts.withColumn("cell",
      st_cell_at(col("lon"), col("lat"), lit(15)))
    val ras = mediaRefs
      .withColumn("parts", split(regexp_replace(col("media_ref"), "^media://tile/", ""), "[/#]"))
      .select(col("ras_id"),
        shiftleft(element_at(col("parts"), 1).cast("long"), 58)
          .bitwiseOR(shiftleft(element_at(col("parts"), 2).cast("long"), 29))
          .bitwiseOR(element_at(col("parts"), 3).cast("long")).as("cell"))
    vec.join(ras, Seq("cell"))
  }
}
