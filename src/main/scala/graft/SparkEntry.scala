package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.GeomFunctions._
import graft.sources.{Synth, DocsTable}

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.json.
  *
  * Every entry in `queries` has a DuckDB oracle in `oracleSql` unless noted;
  * geometry inputs are derived deterministically from the driver's parquet
  * tables with arithmetic both engines compute bit-identically (Synth.scala).
  */
object SparkEntry {

  private def li(s: SparkSession, dir: String) = s.read.parquet(s"$dir/lineitem.parquet")
  private def docsT(s: SparkSession, dir: String) = s.read.parquet(s"$dir/documents.parquet")

  /** Kernel-heavy map stages after a cheap scan: when the scan yields fewer
    * splits than cores (the local test files are single-row-group parquet,
    * so the scan can never split and per-row kernels run on ONE task),
    * redistribute once before the kernels. On a real cluster the scan
    * carries ≫ cores splits and this is a no-op — the condition, not the
    * repartition, is what survives the 100× scale-up.
    */
  private def spread(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    // metadata-only split estimate: `df.rdd.getNumPartitions` (round 1)
    // forced a second physical planning + RDD build of the frame just to
    // read a number (round-2 review). The scan's split count is bounded
    // below by max(#files, totalBytes / maxPartitionBytes), both available
    // from the cached file index / optimizer stats without planning.
    val nFiles = df.inputFiles.length
    if (nFiles == 0) {
      // Non-file-backed frame: optimizer leaf stats default to huge
      // sizeInBytes (defaultSizeInBytes), which would estimate >= cores
      // splits and silently skip the spread — the opposite of the intent.
      // The RDD partition count is the truth here; the extra planning pass
      // only happens on this (rare, small, in-memory) shape.
      val parts = df.rdd.getNumPartitions
      if (parts < cores) df.repartition(cores) else df
    } else {
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val maxPart = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
      val estSplits = math.max(nFiles.toLong, (bytes / maxPart).toLong)
      if (estSplits < cores) df.repartition(cores) else df
    }
  }

  /** round(c, d) with the driver oracle's (DuckDB) double-round zero
    * semantics: a result that rounds to zero keeps the SIGN of the input
    * (`c * 0.0` is IEEE-exact for finite c). Spark's BigDecimal HALF_UP
    * round normalizes -0.0 to +0.0, which is value-equal but BIT-different
    * under the driver's hash — the round-6 q66 red row was exactly one
    * tiny-negative Mercator y mm-rounding to -0.0 in DuckDB and +0.0 here.
    * Also matches the reference's own RoundToPrec -0 -> 0 direction at the
    * unrounded level (geom.go RoundToPrec); applied to every gate that
    * dumps a rounded double (q32/q38/q63/q66 — the q17-style raw-double
    * dumps and the cast-to-long vertex hashes have no signed-zero hazard).
    */
  private def roundZ(c: org.apache.spark.sql.Column, d: Int): org.apache.spark.sql.Column =
    when(round(c, d) === 0.0, c * lit(0.0)).otherwise(round(c, d))

  /** Flagship: interleaved docs table → span extraction → WKT parse →
    * z15 cell encode → broadcast PIP join against regions → per-region
    * rollup. Runs on sf0.001 (driver smoke-checks rows > 0).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = DocsTable.docs(spark, dir)
    val geoms = DocsTable.extractGeometries(docs)
    val pts = geoms
      .filter(st_geomtype(col("geom")) === "Point")
      .select(col("doc_id"), st_x(col("geom")).as("lon"), st_y(col("geom")).as("lat"))
      .withColumn("cell15", st_cell_at(col("lon"), col("lat"), lit(15)))
      .withColumn("cell5", st_cell_at(col("lon"), col("lat"), lit(5)))
    val regions = Synth.regions(spark, dir)
      .withColumn("poly", st_box_polygon(col("minx"), col("miny"), col("maxx"), col("maxy")))
      .withColumn("cell5",
        explode(st_tiles_for_bounds(col("minx"), col("miny"), col("maxx"), col("maxy"), lit(5))))
    pts.join(broadcast(regions), Seq("cell5"), "inner")
      .filter(st_contains(col("poly"), col("lon"), col("lat")))
      .groupBy(col("region_id"))
      .agg(count(lit(1)).as("n_points"),
           countDistinct(col("cell15")).as("n_tiles"))
  }

  /** q33's deterministic input — the reference's composed cmd/main.go
    * pipeline's synthetic polygons placed inside chosen z=9 web-mercator
    * tiles: half valid boxes, half bow-ties needing repair. Shared by the
    * q33 gate, the fused-vs-chained parity spec, and graft.Scaling's
    * prebuilt-geometry tier. Gated at coordinate level (rolling hash of
    * the command stream).
    */
  def q33Input(s: SparkSession, dir: String): DataFrame = {
    // NOTE (round 7, measured): do NOT move the pid dedup of q43/q45 below
    // this builder's geometry expressions. With the aggregate under the
    // WKT build, every generated column is a pure function of the GROUP
    // KEY, so Catalyst pushes mvtPrep's env-isnotnull filter — with the
    // whole WKT+parse+makevalid tree inlined — through the aggregate and
    // exchange down to the SCAN: makevalid ran on all 600k pre-dedup rows
    // at scan parallelism (3 tasks), 3.7 s -> 45 s. Dedup-after-build is
    // load-bearing: the aggregate output column is a pushdown barrier.
    val base = spread(Synth.points(s, dir).select(col("pid")))
      .withColumn("z9", lit(9))
      .withColumn("tx", col("pid") * 7 % 512)
      .withColumn("ty", col("pid") % 312 + 100)
      .withColumn("t", st_tile_extent_3857(lit(9), col("tx"), col("ty")))
      .withColumn("xs", col("t.maxx") - col("t.minx"))
      .withColumn("ys", col("t.maxy") - col("t.miny"))
      .withColumn("gl", col("t.minx") + ((col("pid") % 8).cast("double") * 0.05 + 0.1) * col("xs"))
      .withColumn("gt", col("t.miny") + ((col("pid") % 9).cast("double") * 0.05 + 0.1) * col("ys"))
      .withColumn("ga", col("gl") + ((col("pid") % 4).cast("double") * 0.05 + 0.25) * col("xs"))
      .withColumn("gb", col("gt") + ((col("pid") % 6).cast("double") * 0.04 + 0.25) * col("ys"))
    def pt(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      concat(x.cast("string"), lit(" "), y.cast("string"))
    val boxWkt = concat(lit("POLYGON (("),
      pt(col("gl"), col("gt")), lit(","), pt(col("ga"), col("gt")), lit(","),
      pt(col("ga"), col("gb")), lit(","), pt(col("gl"), col("gb")), lit(","),
      pt(col("gl"), col("gt")), lit("))"))
    val bowWkt = concat(lit("POLYGON (("),
      pt(col("gl"), col("gt")), lit(","), pt(col("ga"), col("gb")), lit(","),
      pt(col("ga"), col("gt")), lit(","), pt(col("gl"), col("gb")), lit(","),
      pt(col("gl"), col("gt")), lit("))"))
    base
      .withColumn("geom", st_geomfromwkt(when(col("pid") % 2 === 0, boxWkt).otherwise(bowWkt)))
      .select(col("pid"), col("z9"), col("tx"), col("ty"), col("geom"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- slippy tiling ----

    "q01_tile_assign" -> ((s, dir) => {
      Synth.points(s, dir).select(
        col("pid"), col("lon"), col("lat"),
        st_lon2tile(col("lon"), lit(15)).as("tx"),
        st_lat2tile(col("lat"), lit(15)).as("ty"))
    }),

    "q02_tile_rollup" -> ((s, dir) => {
      Synth.points(s, dir)
        .select(st_cell_at(col("lon"), col("lat"), lit(15)).as("cell"))
        .select(element_at(st_family_at(col("cell"), lit(9)), 1).as("c9"))
        .groupBy(st_cell_x(col("c9")).as("x9"), st_cell_y(col("c9")).as("y9"))
        .agg(count(lit(1)).as("n"))
    }),

    "q16_tiles_for_bounds" -> ((s, dir) => {
      Synth.regions(s, dir)
        .select(col("region_id"),
          explode(st_tiles_for_bounds(col("minx"), col("miny"), col("maxx"), col("maxy"),
            lit(7))).as("cell"))
        .select(col("region_id"), st_cell_x(col("cell")).as("x"), st_cell_y(col("cell")).as("y"))
    }),

    // ---- spatial join / predicates ----

    "q03_pip_join" -> ((s, dir) => {
      val pts = Synth.points(s, dir)
        .withColumn("cell5", st_cell_at(col("lon"), col("lat"), lit(5)))
      val regions = Synth.regions(s, dir)
        .withColumn("poly", st_box_polygon(col("minx"), col("miny"), col("maxx"), col("maxy")))
        .withColumn("cell5", explode(
          st_tiles_for_bounds(col("minx"), col("miny"), col("maxx"), col("maxy"), lit(5))))
      pts.join(broadcast(regions), Seq("cell5"), "inner")
        .filter(st_contains(col("poly"), col("lon"), col("lat")))
        .select(col("pid"), col("region_id"))
    }),

    "q04_envelope_agg" -> ((s, dir) => {
      Synth.points(s, dir).groupBy(col("l_suppkey"))
        .agg(min(col("lon")).as("minx"), min(col("lat")).as("miny"),
             max(col("lon")).as("maxx"), max(col("lat")).as("maxy"),
             count(lit(1)).as("n"))
    }),

    "q05_clip_points" -> ((s, dir) => {
      Synth.points(s, dir)
        .withColumn("cg", st_clip(st_point(col("lon"), col("lat")),
          lit(-60.0), lit(-60.0), lit(60.0), lit(60.0)))
        .filter(col("cg").isNotNull)
        .select(col("pid"), col("lon"), col("lat"))
    }),

    "q06_winding" -> ((s, dir) => {
      Synth.points(s, dir).select(col("pid"),
        st_orient(col("lon"), col("lat"), col("lon2"), col("lat2"), col("lon2"), col("lat"))
          .as("w"))
    }),

    "q07_perp_distance" -> ((s, dir) => {
      spread(Synth.points(s, dir)).select(col("pid"),
        st_perpendicular_distance(col("lon"), col("lat"), col("lon2"), col("lat2"),
          col("lon2"), col("lat")).as("d"))
    }),

    "q08_seg_intersect" -> ((s, dir) => {
      val p = Synth.points(s, dir)
        .withColumn("si", st_seg_intersect(
          col("lon"), col("lat"), col("lon2"), col("lat2"),
          col("lon2"), col("lat"), col("lon"), col("lat2")))
      p.select(col("pid"), col("si.x").as("ix"), col("si.y").as("iy"), col("si.ok").as("ok"))
    }),

    "q09_simplify" -> ((s, dir) => {
      spread(Synth.points(s, dir))
        .withColumn("ls", st_geomfromwkt(concat(
          lit("LINESTRING ("),
          col("lon").cast("string"), lit(" "), col("lat").cast("string"), lit(","),
          col("lon2").cast("string"), lit(" "), col("lat2").cast("string"), lit(","),
          col("lon2").cast("string"), lit(" "), col("lat").cast("string"), lit(")"))))
        .select(col("pid"),
          st_num_points(st_simplify(col("ls"), lit(5.0))).as("npts"))
    }),

    "q10_dist_to_seg" -> ((s, dir) => {
      Synth.points(s, dir).select(col("pid"),
        st_distance_to_segment(col("lon"), col("lat"), col("lon2"), col("lat2"),
          col("lon2"), col("lat")).as("d"))
    }),

    "q11_wkt_roundtrip" -> ((s, dir) => {
      spread(Synth.points(s, dir))
        .withColumn("g", st_geomfromwkt(st_aswkt(st_point(col("lon"), col("lat")))))
        .select(col("pid"), st_x(col("g")).as("x"), st_y(col("g")).as("y"))
    }),

    "q12_knn" -> ((s, dir) => {
      // the cell-pruned operator is exactly the brute-force result the
      // DuckDB oracle computes (certified by construction; see Knn)
      val pts = Synth.points(s, dir).select(col("pid"), col("lon"), col("lat"))
      val qs = pts.filter(col("pid") % 2999 === 0)
        .select(col("pid").as("qid"), col("lon").as("qlon"), col("lat").as("qlat"))
      graft.operators.Knn.knnJoinAuto(qs, pts, k = 3)
    }),

    // ---- geometry accessors over built polygons ----

    "q15_region_envelope" -> ((s, dir) => {
      Synth.regions(s, dir)
        .withColumn("e", st_envelope(
          st_box_polygon(col("minx"), col("miny"), col("maxx"), col("maxy"))))
        .select(col("region_id"), col("e.minx").as("eminx"), col("e.miny").as("eminy"),
          col("e.maxx").as("emaxx"), col("e.maxy").as("emaxy"))
    }),

    "q17_centroid" -> ((s, dir) => {
      Synth.regions(s, dir)
        .withColumn("c", st_centroid_ref(
          st_box_polygon(col("minx"), col("miny"), col("maxx"), col("maxy"))))
        .select(col("region_id"), col("c.x").as("cx"), col("c.y").as("cy"))
    }),

    // ---- text / dedup ----

    "q13_dedup_exact" -> ((s, dir) => {
      docsT(s, dir).groupBy(md5(col("text").cast("binary")).as("text_md5"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
    }),

    "q14_text_stats" -> ((s, dir) => {
      // n_bpe: BPE-style pre-tokenizer count — letter runs, digit runs and
      // punctuation runs as separate tokens (the GPT-2 pre-tokenizer split,
      // minus its lookahead which RE2 lacks, so the oracle regex is
      // byte-identical in semantics)
      docsT(s, dir).select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_c"),
        size(filter(split(col("text"), "\\s+"), x => x =!= "")).cast("long").as("n_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"), lit(0)))
          .cast("long").as("n_bpe"),
        (length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", "")))
          .cast("long").as("n_punct"))
    }),

    "q18_fingerprint" -> ((s, dir) => {
      docsT(s, dir).select(col("doc_id"), doc_fingerprint(col("text")).as("fp"))
    }),

    // ---- relational baseline ----

    "q19_agg_baseline" -> ((s, dir) => {
      li(s, dir).groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
    }),

    "q20_join_baseline" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val c = s.read.parquet(s"$dir/customer.parquet")
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"))
    }),

    // ---- scale-path operators (operators/*) ----

    "q21_knn_cell" -> ((s, dir) => {
      val pts = Synth.points(s, dir).select(col("pid"), col("lon"), col("lat"))
      val qs = pts
        .filter(col("lon") >= -30 && col("lon") <= 30 && col("lat") >= 0 && col("lat") <= 40)
        .select(col("pid").as("qid"), col("lon").as("qlon"), col("lat").as("qlat"))
      graft.operators.Knn.knnJoinAuto(qs, pts, k = 3)
    }),

    "q22_tiler_assign" -> ((s, dir) => {
      val docs = DocsTable.docs(s, dir)
      // span_offset = 3 is the docs table's polygon span (DocsTable.docs
      // emits points at offset 1, polygons at offset 3), so the offset
      // prefilter is row-equivalent to the type filter that follows — but
      // Catalyst pushes it BELOW the WKT parse, so the 99% non-polygon
      // spans are never parsed (guide §8: use what the optimizer cannot
      // know). The st_geomtype filter stays as the semantic gate; the
      // oracle proves row equivalence.
      val polys = DocsTable.extractGeometries(docs)
        .filter(col("span_offset") === 3)
        .filter(st_geomtype(col("geom")) === "Polygon")
      graft.operators.Tiler.assignTiles(polys, "doc_id", 9)
        .groupBy(st_cell_x(col("cell")).as("x"), st_cell_y(col("cell")).as("y"))
        .agg(count(lit(1)).as("n_geoms"))
    }),

    "q23_ann_cosine" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("vid"), col("embedding").cast("array<double>").as("vec"))
      val qs = emb.filter(col("vid") % 40 === 0)
        .select(col("vid").as("qid"), col("vec").as("qvec"))
      graft.operators.Ann.cosineTopK(qs, emb, k = 5)
    }),

    "q24_minhash_sig" -> ((s, dir) => {
      val sig = docsT(s, dir).select(col("doc_id"), minhash(col("text"), lit(8)).as("sig"))
      sig.select(col("doc_id") +:
        (0 until 8).map(i => element_at(col("sig"), i + 1).as(s"s$i")): _*)
    }),

    "q25_simhash" -> ((s, dir) => {
      docsT(s, dir).select(col("doc_id"), simhash(col("text")).as("sh"))
    }),

    "q26_sessions" -> ((s, dir) => {
      graft.streaming.Sessionize.batch(s.read.parquet(s"$dir/events.parquet"))
    }),

    "q27_media_meta" -> ((s, dir) => {
      val media = docsT(s, dir).select(col("doc_id"), col("text").cast("binary").as("blob"))
      graft.operators.Media.extractMeta(media, "doc_id", "blob")
    }),

    "q29_makevalid" -> ((s, dir) => {
      val docs = DocsTable.docs(s, dir)
      // offset-3 prefilter: same row set as the type filter (q22 note),
      // pushed below the WKT parse so only polygon spans pay it
      val polys = DocsTable.extractGeometries(docs)
        .filter(col("span_offset") === 3)
        .filter(st_geomtype(col("geom")) === "Polygon")
      val nan = lit(Double.NaN)
      // vhash: order-independent coordinate-level gate — sum over output
      // vertices of (round(x·1000)·1000003 + round(y·1000)). Output coords
      // already sit on the 1e-3 grid (Subdivision.roundPoint), so the
      // re-rounding is noise-free; the oracle predicts every vertex
      // (corners + the bow-tie diagonal intersection) arithmetically.
      polys.select(col("doc_id"),
        st_makevalid(col("geom"), nan, nan, nan, nan).as("fixed"))
        .select(col("doc_id"),
          st_geomtype(col("fixed")).as("gtype"),
          st_num_points(col("fixed")).as("npts"),
          aggregate(st_dump_points(col("fixed")), lit(0L), (acc, p) =>
            acc + (round(p.getField("x") * 1000).cast("long") * 1000003L +
                   round(p.getField("y") * 1000).cast("long"))).as("vhash"))
    }),

    "q30_mvt_prepare" -> ((s, dir) => {
      Synth.points(s, dir)
        .withColumn("cell", st_cell_at(col("lon"), col("lat"), lit(9)))
        .withColumn("prep", st_prepare_tile(st_point(col("lon"), col("lat")), col("cell")))
        .select(col("pid"), st_x(col("prep")).as("px"), st_y(col("prep")).as("py"))
    }),

    "q31_geojson_roundtrip" -> ((s, dir) => {
      spread(Synth.points(s, dir))
        .withColumn("g", st_geomfromgeojson(st_asgeojson(st_point(col("lon"), col("lat")))))
        .select(col("pid"), st_x(col("g")).as("x"), st_y(col("g")).as("y"))
    }),

    "q32_utm" -> ((s, dir) => {
      Synth.points(s, dir)
        .filter(col("lat") >= -80 && col("lat") <= 84)
        .withColumn("u", st_utm_from_lnglat(col("lon"), col("lat")))
        // meters rounded to mm: a single transcendental differing by
        // 1 ulp between JVM and DuckDB libm (observed once in 57k rows)
        // is ~6e-11 m here; the mm grid absorbs it with ~1e-8 flip risk
        .select(col("pid"), roundZ(col("u.northing"), 3).as("northing"),
          roundZ(col("u.easting"), 3).as("easting"), col("u.zone_number").as("zn"),
          col("u.zone_letter").as("zl"))
    }),

    "q33_pipeline" -> ((s, dir) => {
      graft.operators.TilePipeline.mvtCommands(q33Input(s, dir), "geom", "z9", "tx", "ty")
        .select(col("pid"), col("mvt_type"),
          size(col("mvt_commands")).cast("long").as("n_cmds"),
          aggregate(col("mvt_commands"), lit(0L),
            (acc, c) => (acc * 31L + c) % 1000000000000007L).as("chash"))
    }),

    "q34_ann_lsh" -> ((s, dir) => {
      // the SCALE ann path: corpus bucketed by sign-random-projection,
      // queries multi-probe their bucket + Hamming-1 neighbors; the oracle
      // reproduces the deterministic hyperplanes as exact-decimal literals
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("vid"), col("embedding").cast("array<double>").as("vec"))
      val qs = emb.filter(col("vid") % 40 === 0)
        .select(col("vid").as("qid"), col("vec").as("qvec"))
      graft.operators.Ann.lshTopK(qs, emb, k = 5, dim = 64, bits = 8, multiProbe = true)
    }),

    "q35_simplify_dp" -> ((s, dir) => {
      // 5-point zigzag exercising REAL Douglas-Peucker recursion: top-level
      // split at the forced max (p2, 2° off the baseline), then each 3-point
      // half either keeps all (dmax > tol, len ≤ 3 rule) or collapses to its
      // endpoints; midpoint dedupe joins the halves. tol = 0.5.
      def c(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        concat(x.cast("string"), lit(" "), y.cast("string"))
      val p = spread(Synth.points(s, dir))
        .withColumn("y1v", col("lat") + (col("pid") % 3).cast("double") * 0.3)
        .withColumn("y3v", col("lat") + (col("pid") % 5).cast("double") * 0.2)
        .withColumn("ls", st_geomfromwkt(concat(lit("LINESTRING ("),
          c(col("lon"), col("lat")), lit(","),
          c(col("lon") + 1, col("y1v")), lit(","),
          c(col("lon") + 2, col("lat") + 2), lit(","),
          c(col("lon") + 3, col("y3v")), lit(","),
          c(col("lon") + 4, col("lat")), lit(")"))))
        .withColumn("g", st_simplify(col("ls"), lit(0.5)))
      p.select(col("pid"), st_num_points(col("g")).as("npts"),
        aggregate(st_dump_points(col("g")), lit(0L), (acc, q) =>
          ((acc * 31L) + (round(q.getField("x") * 1000000.0).cast("long") * 1000003L +
            round(q.getField("y") * 1000000.0).cast("long"))) % 1000000000000007L).as("vhash"))
    }),

    "q36_rectify" -> ((s, dir) => {
      // winding rectification: ring 0 forced clockwise; even pids supply a
      // CCW triangle (must reverse), odd pids a CW one (kept). The hash is
      // ORDER-DEPENDENT (rolling), so it gates the reversal itself.
      def c(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        concat(x.cast("string"), lit(" "), y.cast("string"))
      val p0 = (col("lon"), col("lat"))
      val p1 = (col("lon") + 3, col("lat") + 1)
      val p2 = (col("lon") + 1, col("lat") + 2)
      val ccw = concat(lit("POLYGON (("), c(p0._1, p0._2), lit(","), c(p1._1, p1._2),
        lit(","), c(p2._1, p2._2), lit(","), c(p0._1, p0._2), lit("))"))
      val cw = concat(lit("POLYGON (("), c(p0._1, p0._2), lit(","), c(p2._1, p2._2),
        lit(","), c(p1._1, p1._2), lit(","), c(p0._1, p0._2), lit("))"))
      spread(Synth.points(s, dir))
        .withColumn("g", st_rectify_polygon(st_geomfromwkt(
          when(col("pid") % 2 === 0, ccw).otherwise(cw))))
        .select(col("pid"), st_num_points(col("g")).as("npts"),
          aggregate(st_dump_points(col("g")), lit(0L), (acc, q) =>
            ((acc * 31L) + (round(q.getField("x") * 1000000.0).cast("long") * 1000003L +
              round(q.getField("y") * 1000000.0).cast("long"))) % 1000000000000007L).as("vhash"))
    }),

    "q37_clip_line" -> ((s, dir) => {
      // the 4-case linestring clip walk (clip/linestring.go:45-170): a
      // 3-point polyline entering through the left edge and exiting through
      // the right edge of a per-row box; output = [entry, p1, exit], with
      // the entry/exit points produced by segmentIntersect against the CW
      // box edges — mirrored op-for-op in the oracle.
      def c(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        concat(x.cast("string"), lit(" "), y.cast("string"))
      val ls = concat(lit("LINESTRING ("),
        c(col("lon") - 1, col("lat") + 0.5), lit(","),
        c(col("lon") + 1, col("lat") + 1), lit(","),
        c(col("lon") + 3, col("lat") + 1.5), lit(")"))
      spread(Synth.points(s, dir))
        .withColumn("g", st_clip(st_geomfromwkt(ls),
          col("lon"), col("lat"), col("lon") + 2, col("lat") + 2))
        .select(col("pid"), st_geomtype(col("g")).as("gtype"),
          st_num_points(col("g")).as("npts"),
          aggregate(st_dump_points(col("g")), lit(0L), (acc, q) =>
            ((acc * 31L) + (round(q.getField("x") * 1000000.0).cast("long") * 1000003L +
              round(q.getField("y") * 1000000.0).cast("long"))) % 1000000000000007L).as("vhash"))
    }),

    "q28_lang_score" -> ((s, dir) => {
      val padded = concat(lit(" "), lower(col("text")), lit(" "))
      // " word " (len+2) → " x" (2): length drops by len(word) per hit
      def hits(word: String) =
        ((length(padded) - length(regexp_replace(padded, s" $word ", " x")))
          / lit(word.length)).cast("long")
      docsT(s, dir).select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"), x => x =!= "")).cast("long").as("n_tokens"),
        (hits("the") + hits("and") + hits("of") + hits("to")).as("stop_hits"))
        .withColumn("score", col("stop_hits").cast("double") / col("n_tokens"))
        .withColumn("is_en", col("score") >= 0.05)
    }),

    "q38_utm_inverse" -> ((s, dir) => {
      // synthetic UTM coordinates derived from pid by pure arithmetic
      // (valid zone letters only, northing placed so the latitude series
      // stays away from the poles); the inverse projection — including the
      // reference's d6·720 quirk (utm.go ToLngLat) — is mirrored
      // op-for-op in the DuckDB oracle. Gated at 1e-9° (~0.1 mm).
      Synth.points(s, dir).select(col("pid"))
        .withColumn("zn", (col("pid") % 60 + 1).cast("int"))
        .withColumn("zl", expr("substring('CDEFGHJKLMNPQRSTUVWX', cast(pid % 20 as int) + 1, 1)"))
        .withColumn("northing",
          lit(2000000.0) + (col("pid") % 740).cast("double") * 10000.0 +
            (col("pid") % 1000).cast("double") * 7.13)
        .withColumn("easting",
          lit(100000.0) + (col("pid") % 797).cast("double") * 1000.0 +
            (col("pid") % 13).cast("double") * 7.3)
        .withColumn("ll", st_lnglat_from_utm(col("northing"), col("easting"), col("zn"), col("zl")))
        .select(col("pid"), roundZ(col("ll.lng"), 9).as("lng"), roundZ(col("ll.lat"), 9).as("lat"))
    }),

    "q39_embed_neardup" -> ((s, dir) => {
      // embedding-cosine near-dup: the base embeddings carry no near-pairs
      // (max background cosine ≈ 0.51), so the query deterministically
      // plants one perturbed copy per vid%10==0 vector (component i scaled
      // by 1 + ((vid+i)%7−3)·1e-4, identically derivable in SQL), then runs
      // the LSH-bucketed near-dup operator at τ=0.99: candidates only
      // within a sign-projection bucket — never all-pairs.
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("vid"), col("embedding").cast("array<double>").as("vec"))
      val planted = emb.filter(col("vid") % 10 === 0)
        .select(col("vid").as("ovid"), col("vec"))  // unambiguous: lateral
        // alias resolution would otherwise bind vid inside the transform
        // to the NEW (+1000000) vid and shift the %7 pattern
        .select((col("ovid") + 1000000L).as("vid"),
          transform(col("vec"), (x, i) =>
            x * (lit(1.0) + ((col("ovid") + i.cast("long")) % 7 - 3).cast("double") * lit(1e-4)))
            .as("vec"))
      graft.operators.Dedup.embedNearDupPairs(emb.unionByName(planted),
        dim = 64, bits = 8, tau = 0.99)
    }),

    "q40_ann_ivf" -> ((s, dir) => {
      // IVF ANN with a LEARNED coarse quantizer (round-4 verdict #2): a
      // deterministic hash-ordered sample + fixed-iteration spherical
      // k-means fits √N (capped) unit-norm centroids ON THE DATA; corpus
      // assignment is one map-side projection, queries probe their top-3
      // lists. The DuckDB oracle re-runs the ENTIRE fit in SQL (the
      // centroids are data, not constants) — every float reduction has a
      // defined order so both engines land on identical bits. The 64-
      // centroid cap here is the oracle-cost gate knob (interpreted list
      // lambdas); the engine default is 1024, and the √N scaling of the
      // probed fraction is gated by IvfLearnedSpec at two corpus sizes.
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("vid"), col("embedding").cast("array<double>").as("vec"))
      val model = graft.operators.IvfLearned.fit(emb, dim = 64, iters = 5, maxCentroids = 64)
      val qs = emb.filter(col("vid") % 40 === 0)
        .select(col("vid").as("qid"), col("vec").as("qvec"))
      graft.operators.IvfLearned.ivfTopK(qs, emb, k = 5, dim = 64, model, nProbe = 3)
    }),

    "q41_rasterize" -> ((s, dir) => {
      // raster side of the raster↔vector tiler: point occupancy on each
      // z9 tile's 256×256 pixel grid (a z9 pixel IS a z17 tile — the same
      // map-only vectorized cell encode, one shuffle for the occupancy agg)
      val pts = Synth.points(s, dir).select(col("pid"), col("lon"), col("lat"))
      graft.operators.Tiler.rasterizePoints(pts, z = 9, res = 256)
        .select(st_cell_x(col("cell")).as("x"), st_cell_y(col("cell")).as("y"),
          col("py").cast("long").as("py"), col("px").cast("long").as("px"), col("n"))
    }),

    "q42_raster_runs" -> ((s, dir) => {
      // vectorize step 1: gaps-and-islands merge of adjacent occupied
      // pixels into horizontal runs — one window + one groupBy on (cell,py).
      // z5/64px (z11 pixels) keeps the grid dense enough that runs really
      // merge at sf0.01 (q41's z9/256px grid is occupancy-sparse)
      val pts = Synth.points(s, dir).select(col("pid"), col("lon"), col("lat"))
      val ras = graft.operators.Tiler.rasterizePoints(pts, z = 5, res = 64)
      graft.operators.Tiler.rasterRuns(ras)
        .select(st_cell_x(col("cell")).as("x"), st_cell_y(col("cell")).as("y"),
          col("py").cast("long").as("py"), col("px0").cast("long").as("px0"),
          col("px1").cast("long").as("px1"), col("n_pts"))
    }),

    "q43_mvt_tile_bytes" -> ((s, dir) => {
      // the FINISHED sink artifact: q33's composed flow (makevalid repair)
      // fed through the real MVT tile sink — envelope tile assignment,
      // per-feature command encode, deterministic (cell, fid)-sorted
      // streaming layer/tile protobuf assembly. Gated on the actual
      // protobuf BYTES per tile (rolling hash + length); the oracle
      // predicts every byte incl. varint framing and key/value tables
      // (encoding/mvt/layer.go:15-131, tile.go:45-63).
      import s.implicits._
      // the synthetic lineitem carries duplicate (orderkey, linenumber)
      // rows -> duplicate pids; identical duplicates collapse (the sink
      // joins on pid, which would cross-multiply them). The explicit-N
      // repartition before the dedup pins the downstream makevalid + tile
      // prep stage at full parallelism — AQE coalesced the small dedup
      // exchange to 16 tasks although its downstream is CPU-bound (2.1 s
      // -> 0.7 s wall on that stage), and dedup reuses the partitioning
      // so no second exchange appears.
      val fixed = q33Input(s, dir)
        .select(col("pid"), col("geom"))
        .repartition(s.sparkContext.defaultParallelism, col("pid"))
        .dropDuplicates("pid") // BEFORE the repair: smaller shuffle, no wasted kernels
        .withColumn("geom", st_makevalid(col("geom"),
          lit(Double.NaN), lit(Double.NaN), lit(Double.NaN), lit(Double.NaN)))
      graft.operators.Tiler.mvtTiles(s, fixed, "pid", 9, "features", srid = 3857)
        .select(col("x"), col("y"), col("mvt"))
        .as[(Long, Long, Array[Byte])]
        .map { case (x, y, b) =>
          var acc = 0L
          var i = 0
          while (i < b.length) {
            acc = (acc * 31 + (b(i) & 0xFF)) % 1000000000000007L
            i += 1
          }
          (x, y, b.length.toLong, acc)
        }.toDF("x", "y", "n_bytes", "bhash")
    }),

    "q44_neardup_pairs" -> ((s, dir) => {
      // the one-pass MinHash-LSH near-dup operator, driver-gated: signature
      // ride-along through the band explode, one shuffle on (band, bhash),
      // map-side est-Jaccard verify, first-shared-band dedupe (no distinct)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.operators.Dedup.nearDupPairs(docs, "doc_id", "text",
        bands = 4, rowsPerBand = 4, threshold = 0.5)
        .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
    }),

    "q45_mvt_typed_tags" -> ((s, dir) => {
      // TYPED tag values through the MVT sink: each feature carries
      // fid:string + pid:int64 + score:double + even:bool, encoded as the
      // reference's 7-variant Value message family (vector_tile.proto:22-28,
      // layer.go:133-190) with cross-feature value dedup — the two bool
      // values dedupe across the whole layer, so the oracle must reproduce
      // the first-appearance index bookkeeping to predict the bytes.
      import s.implicits._
      val fixed = q33Input(s, dir)
        .select(col("pid"), col("geom"))
        .repartition(s.sparkContext.defaultParallelism, col("pid"))
        .dropDuplicates("pid") // q43 note: explicit-N pins the repair stage width
        .withColumn("geom", st_makevalid(col("geom"),
          lit(Double.NaN), lit(Double.NaN), lit(Double.NaN), lit(Double.NaN)))
        .withColumn("score", col("pid").cast("double") / lit(4.0) + lit(0.5))
        .withColumn("even", (col("pid") % 2) === 0)
      graft.operators.Tiler.mvtTiles(s, fixed, "pid", 9, "features", srid = 3857,
          propCols = Seq("pid", "score", "even"))
        .select(col("x"), col("y"), col("mvt"))
        .as[(Long, Long, Array[Byte])]
        .map { case (x, y, b) =>
          var acc = 0L
          var i = 0
          while (i < b.length) {
            acc = (acc * 31 + (b(i) & 0xFF)) % 1000000000000007L
            i += 1
          }
          (x, y, b.length.toLong, acc)
        }.toDF("x", "y", "n_bytes", "bhash")
    }),

    "q46_geojson_feature" -> ((s, dir) => {
      // GeoJSON Feature codec gate (geojson.go:44-123, 297-319): encode a
      // Feature per point (id + geometry + sorted-key properties, Go wire
      // shape), char-hash the STRING, and decode it back through the
      // case-insensitive Unmarshal dispatch — both directions in one gate.
      // Coordinates quantized to quarters (exact dyadic) so Java and
      // DuckDB double formatting agree character-for-character.
      import s.implicits._
      spread(Synth.points(s, dir))
        .select(col("pid"),
          (floor(col("lon") * 4) / 4.0).as("x"),
          (floor(col("lat") * 4) / 4.0).as("y"))
        .as[(Long, Double, Double)]
        .map { case (pid, x, y) =>
          import graft.core.{GeoJson, Geom}
          val json = GeoJson.encodeFeature(GeoJson.Feature(
            Some(Geom.GPoint((x, y))), id = Some(pid),
            properties = Some(Map("name" -> ("p" + pid), "rank" -> (pid % 100)))))
          val back = GeoJson.decodeFeatureOrCollection(json)
            .swap.getOrElse(sys.error("feature decode dispatch failed"))
          var acc = 0L
          var i = 0
          while (i < json.length) {
            acc = (acc * 31 + json.charAt(i)) % 1000000000000007L
            i += 1
          }
          (pid, json.length.toLong, acc, back.id.get,
            back.properties.get("rank").asInstanceOf[Long])
        }.toDF("pid", "n_chars", "jhash", "rid", "rrank")
    }),

    "q47_neardup_exact" -> ((s, dir) => {
      // exact n-gram Jaccard dedup: LSH bands for recall (any shared
      // band), exact word-3-shingle set Jaccard for precision, shingle
      // sets joined back per candidate (never shipped through the band
      // explode). Completes the dedup family: exact-hash / MinHash-est /
      // SimHash / embedding-cosine / exact n-gram Jaccard.
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.operators.Dedup.nearDupPairsExact(docs, "doc_id", "text",
        bands = 4, rowsPerBand = 4, threshold = 0.5)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
    }),

    "q48_image_decode" -> ((s, dir) => {
      // REAL image decode (round-4 verdict #3): one deterministic PNG per
      // sampled document (pixel = exact integer fn of id,x,y), pushed
      // through the ACTUAL javax.imageio decoder in the per-partition
      // shape, then 4×4-grid channel means from the decoded raster. The
      // oracle replays the pixel function in SQL — PNG is lossless, so
      // encode→decode→stats must reproduce the oracle bits exactly; any
      // codec drift (color model, row order, truncation) breaks the hash.
      val ids = s.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 5 === 0).select(col("doc_id"))
      val pngs = graft.operators.Media.synthPng(s, ids, "doc_id", w = 16, h = 16)
      graft.operators.Media.imageGridStats(s, pngs, "media_id", "png", grid = 4)
    }),

    "q49_neardup_clusters" -> ((s, dir) => {
      // pairs → CLUSTERS: the q44 near-dup pairs closed into connected
      // components (alternating large-star/small-star — min-agg + join per
      // round, no per-node collect), min doc id elected keeper, singletons
      // joined back as their own cluster. `filter(keeper)` IS the deduped
      // corpus; the oracle closes the same pairs with a recursive CTE.
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.operators.Dedup.nearDupClusters(docs, "doc_id", "text",
        bands = 4, rowsPerBand = 4, threshold = 0.5)
        .select(col("doc"), col("rep"), col("csize"), col("keeper"))
    }),

    "q50_decontaminate" -> ((s, dir) => {
      // benchmark decontamination: distinct shingle hashes of a small
      // "benchmark" slice (every 97th doc) broadcast against the exploded
      // corpus shingles; per-doc overlap counted in ONE shuffle. minHits=2
      // keeps the flag non-trivial (a single shared stock phrase passes).
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val bench = docs.filter(col("doc_id") % 97 === 0)
      graft.operators.Curation.contamination(docs, "doc_id", "text",
        bench, "text", minHits = 2)
        .select(col("doc"), col("n_sh"), col("hits"), col("contaminated"))
    }),

    "q51_quota_sample" -> ((s, dir) => {
      // per-source quota: keep the 5 longest docs per source (doc_id
      // tiebreak) — rank+filter form so InferWindowGroupLimit keeps the
      // map-side partial top-k below the source exchange
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.operators.Curation.quotaSample(docs, "source", "doc_id", "n_chars", quota = 5)
        .select(col("doc_id"), col("source"), col("n_chars"), col("rk"))
    }),

    "q52_wkb_bytes" -> ((s, dir) => {
      // the geom column IS the Wkb wire format (LE, reference encoding/wkb
      // layout), so hashing the raw column bytes gates the WKB encoder
      // byte-for-byte: a point and its CW box polygon per pid, with
      // quarter-valued coordinates whose IEEE-754 bits the oracle derives
      // exactly ((1020+k)<<52 + n<<(52-k) for n/4, the q45 technique)
      import s.implicits._
      val hp = 1000000000000007L
      Synth.points(s, dir).select(col("pid")).filter(col("pid") % 7 === 0)
        .withColumn("x", (col("pid") + 1).cast("double") / 4.0)
        .withColumn("y", (col("pid") + 2).cast("double") / 4.0)
        .withColumn("pt", st_point(col("x"), col("y")))
        .withColumn("box", st_box_polygon(col("x"), col("y"),
          col("x") + 1.5, col("y") + 2.25))
        .select(col("pid"), col("pt"), col("box"))
        .map { r =>
          def h(b: Array[Byte]): Long = {
            var acc = 0L; var i = 0
            while (i < b.length) { acc = (acc * 31 + (b(i) & 0xFF)) % hp; i += 1 }
            acc
          }
          val pt = r.getAs[Array[Byte]]("pt"); val bx = r.getAs[Array[Byte]]("box")
          (r.getLong(0), pt.length.toLong, h(pt), bx.length.toLong, h(bx))
        }.toDF("pid", "n_pt", "pt_hash", "n_box", "box_hash")
    }),

    "q53_pip_join_bigbig" -> ((s, dir) => {
      // q03's semantics through the NO-BROADCAST plan (SpatialJoin
      // .pipJoin): both sides keyed by cell, one shuffle join, exact
      // st_contains filter — the path for a polygon side too large to
      // broadcast. The round-6 form bounds per-row replication: polygons
      // cover at a per-row adaptive zoom (≤64 cells) shipping only
      // (id, bbox, cell); the geometry joins back by region_id for the
      // exact predicate. Same oracle as q03; the gate pins that the
      // bounded shuffle plan is result-identical to the broadcast plan.
      val pts = Synth.points(s, dir)
      val regions = Synth.regions(s, dir)
        .withColumn("poly", st_box_polygon(col("minx"), col("miny"), col("maxx"), col("maxy")))
      graft.operators.SpatialJoin.pipJoin(pts, "lon", "lat", regions,
          "region_id", "poly", z = 5)
        .select(col("pid"), col("region_id"))
    }),

    "q54_distance_join" -> ((s, dir) => {
      // within-distance join, no broadcast: left disc-bbox cell cover ×
      // right single cell, one shuffle, exact planar degree metric.
      // (pid % 4: TPC-H-derived pids are sparse — % 20 matches nothing;
      // radius 1.0: the synthetic lattice's min point spacing is ~0.6°)
      val pts = Synth.points(s, dir)
      val l = pts.filter(col("pid") % 4 === 0)
        .select(col("pid").as("qid"), col("lon").as("qlon"), col("lat").as("qlat"))
      val r = pts.select(col("pid").as("nid"), col("lon"), col("lat"))
      graft.operators.SpatialJoin.distanceJoin(l, "qlon", "qlat", r, "lon", "lat",
          radius = 1.0)
        .filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"))
    }),

    "q55_extent_join" -> ((s, dir) => {
      // bbox-overlap join with the reporting-cell dedupe (one shuffle,
      // NO distinct exchange): each overlapping pair is emitted only in
      // the cell of its intersection rectangle's NW corner, at the
      // shallower of the pair's per-row adaptive cover zooms (round-6
      // hierarchical form; zoom derived from footer stats by default).
      // Left side: 2°×2° boxes grown from a point subset; right side:
      // the region bboxes (regions never overlap EACH OTHER, so a
      // self-join is vacuous — this cross-table form has real matches)
      val pts = Synth.points(s, dir).filter(col("pid") % 16 === 0)
      val a = pts.select(col("pid"),
        col("lon").as("aminx"), col("lat").as("aminy"),
        (col("lon") + 2.0).as("amaxx"), (col("lat") + 2.0).as("amaxy"))
      val b = Synth.regions(s, dir).select(col("region_id"),
        col("minx").as("bminx"), col("miny").as("bminy"),
        col("maxx").as("bmaxx"), col("maxy").as("bmaxy"))
      graft.operators.SpatialJoin.extentJoin(
          a, "aminx", "aminy", "amaxx", "amaxy",
          b, "bminx", "bminy", "bmaxx", "bmaxy")
        .select(col("pid"), col("region_id"))
    }),

    "q56_tfidf_terms" -> ((s, dir) => {
      // top-5 characteristic terms per document; rational idf
      // (N+1)/(df+1) so the score column is bit-reproducible in DuckDB
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.operators.Curation.tfidfTopTerms(docs, "doc_id", "text", k = 5)
    }),

    "q57_quantiles" -> ((s, dir) => {
      // exact percentile_disc per source over doc length — one shuffle,
      // shared rank/count windows, map-side quantile fan-out
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.operators.Curation.exactQuantiles(docs, "source", "n_chars", "doc_id",
        Seq(0.25, 0.5, 0.75, 0.95))
    }),

    "q58_hash_sample" -> ((s, dir) => {
      // deterministic MINSTD id-hash sample: same ids kept in every run,
      // engine, and partition layout
      val docs = s.read.parquet(s"$dir/documents.parquet")
      graft.operators.Curation.hashSample(docs, "doc_id", fraction = 0.25)
        .select(col("doc_id"), col("source"), col("n_chars"))
    }),

    "q59_quantize_int8" -> ((s, dir) => {
      // symmetric per-vector int8 quantization of the embedding column
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      graft.operators.Ann.quantizeInt8(emb, "vec_id", "embedding")
    }),

    "q60_image_resize" -> ((s, dir) => {
      // REAL decode + nearest-neighbor resize 16×16 → 8×8: source pixel
      // (2x, 2y) by integer floor division, so the oracle replays the
      // synthetic pixel function at the sampled coordinates exactly
      val ids = s.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 5 === 0).select(col("doc_id"))
      val pngs = graft.operators.Media.synthPng(s, ids, "doc_id", w = 16, h = 16)
      graft.operators.Media.resizePixels(s, pngs, "media_id", "png", dw = 8, dh = 8)
    }),

    "q61_asof_join" -> ((s, dir) => {
      // point-in-time enrichment: each click gets the latest view AT OR
      // BEFORE it for the same user — the union-window as-of form (one
      // key shuffle, no join). Inner form (unmatched clicks dropped).
      val ev = s.read.parquet(s"$dir/events.parquet")
      val l = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val r = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_id"), col("value").as("view_value"))
      graft.operators.AsOf.asofJoin(l, r, "user_id", "ts", rightTieCol = "view_id")
        .filter(col("view_id").isNotNull)
        .select(col("event_id"), col("user_id"), col("view_id"), col("view_value"))
    }),

    "q62_asof_lookback" -> ((s, dir) => {
      // bounded-lookback as-of: the latest view within 24 h before the
      // click, else NULLs (feature-freshness semantics — a stale feature
      // must read as missing). Same single key shuffle as q61; horizon
      // compared in exact int64 microseconds (unix_micros / epoch_us).
      val ev = s.read.parquet(s"$dir/events.parquet")
      val l = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val r = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_id"), col("value").as("view_value"))
      graft.operators.AsOf.asofJoinWithin(l, r, "user_id", "ts",
          rightTieCol = "view_id", horizon = 86400000000L)
        .select(col("event_id"), col("user_id"), col("view_id"), col("view_value"))
    }),

    "q63_project_lcc" -> ((s, dir) => {
      // arbitrary-CRS forward projection (state-plane LCC 2SP, EPSG:2263,
      // US survey feet) — the Grid{Srid} family beyond the reference's
      // four vendored proj codes (core/Proj.scala). Map-only; ftUS
      // rounded to 1e-3 (q32's mm-grid ULP-absorption pattern).
      Synth.points(s, dir)
        .withColumn("pp", st_project(col("lon"), col("lat"), 2263))
        .select(col("pid"), roundZ(col("pp.x"), 3).as("easting_ft"),
          roundZ(col("pp.y"), 3).as("northing_ft"))
    }),

    "q64_seq_pack" -> ((s, dir) => {
      // sequence packing (concat-and-chunk) into capacity-2048 training
      // windows over 8 hash shards — one per-shard cumulative-sum shuffle
      graft.operators.Curation.packSequences(
        docsT(s, dir), "doc_id", "n_chars", capacity = 2048L, numShards = 8)
    }),

    "q65_mixture" -> ((s, dir) => {
      // domain-mixture resampling to an exact 4:3:2:1 target over four
      // sources — per-domain keep counts computed in-plan, smallest
      // MINSTD id hashes kept (deterministic across engines/runs)
      graft.operators.Curation.mixtureSample(
        docsT(s, dir).filter(col("source").isin("src0", "src1", "src2", "src3")),
        "source", "doc_id",
        Map("src0" -> 4L, "src1" -> 3L, "src2" -> 2L, "src3" -> 1L))
        .select(col("doc_id"), col("source"), col("keep_n"))
    }),

    "q66_transform_geom" -> ((s, dir) => {
      // whole-geometry reprojection (ApplyToPoints ∘ Grid{Srid}): 4326 →
      // 3857 over both recursion branches (LINESTRING / MULTILINESTRING),
      // vertex order preserved by the coordinate dump; the mm grid
      // absorbs cross-libm tan/log ULPs (q32 pattern)
      val base = spread(Synth.points(s, dir))
      def pt(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        concat(x.cast("string"), lit(" "), y.cast("string"))
      val mx = (col("lon") + col("lon2")) / 2
      val my = (col("lat") + col("lat2")) / 2
      val lineWkt = concat(lit("LINESTRING ("),
        pt(col("lon"), col("lat")), lit(","),
        pt(col("lon2"), col("lat2")), lit(","), pt(mx, my), lit(")"))
      val mlWkt = concat(lit("MULTILINESTRING (("),
        pt(col("lon"), col("lat")), lit(","),
        pt(col("lon2"), col("lat2")), lit("),("),
        pt(col("lon"), col("lat2")), lit(","),
        pt(col("lon2"), col("lat")), lit("))"))
      base
        .withColumn("g", st_geomfromwkt(
          when(col("pid") % 2 === 0, lineWkt).otherwise(mlWkt)))
        .withColumn("m", st_transform(col("g"), 4326, 3857))
        .select(col("pid"), posexplode(st_dump_points(col("m"))))
        .select(col("pid"), col("pos").cast("long").as("idx"),
          roundZ(col("col.x"), 3).as("mx"), roundZ(col("col.y"), 3).as("my"))
    }),

    "q67_repetition" -> ((s, dir) => {
      // Gopher-style repetition quality signals: duplicate-word fraction,
      // top-2-gram char coverage, duplicated-3-gram char coverage — one
      // text scan, fractions bit-reproducible (single int64→double divide)
      graft.operators.Curation.repetitionSignals(docsT(s, dir), "doc_id", "text")
    }),

    "q68_redact_pii" -> ((s, dir) => {
      // PII scrub over deterministically-injected emails/IPs (the corpus
      // text is synthetic word soup, so the gate plants its own PII the
      // oracle rebuilds identically): emails first, IPs on the
      // email-redacted text — map-only
      val aug = docsT(s, dir).withColumn("aug", concat(
        substring(col("text"), 1, 40),
        lit(" mail user"), (col("doc_id") % 97).cast("string"),
        lit("@ex"), (col("doc_id") % 7).cast("string"),
        lit(".com ip 10."), (col("doc_id") % 251).cast("string"),
        lit(".0."), (col("doc_id") % 250).cast("string"), lit(" tail")))
      graft.operators.Curation.redactPii(aug, "doc_id", "aug")
    }),

    "q69_strat_split" -> ((s, dir) => {
      // deterministic stratified train/val/test split, 8:1:1 per source —
      // exact floor proportions, MINSTD rank, one window shuffle
      graft.operators.Curation.stratifiedSplit(
        docsT(s, dir), "source", "doc_id",
        Seq("train" -> 8L, "val" -> 1L, "test" -> 1L))
        .select(col("doc_id"), col("source"), col("split"))
    }),

    "q70_bucketed_pip" -> ((s, dir) => {
      // the q03 join through a cell-BUCKETED table layout: pay the cell
      // shuffle once at write time, then the join itself plans with zero
      // exchange on either side (asserted in SpatialJoinSpec) — the
      // repeated-join form at corpus scale. Same rows as q03's oracle.
      val pts = Synth.points(s, dir)
        .withColumn("cell5", st_cell_at(col("lon"), col("lat"), lit(5)))
        .select(col("pid"), col("lon"), col("lat"), col("cell5"))
      val regions = Synth.regions(s, dir)
        .withColumn("poly", st_box_polygon(col("minx"), col("miny"), col("maxx"), col("maxy")))
        .withColumn("cell5", explode(
          st_tiles_for_bounds(col("minx"), col("miny"), col("maxx"), col("maxy"), lit(5))))
        .select(col("region_id"), col("poly"), col("cell5"))
      graft.sources.CatalogIO.writeBucketed(pts, "graft_q70_pts", "cell5", 16)
      graft.sources.CatalogIO.writeBucketed(regions, "graft_q70_regions", "cell5", 16)
      graft.operators.SpatialJoin.pipJoinBucketed(s,
          "graft_q70_pts", "graft_q70_regions", "cell5", "lon", "lat", "poly")
        .select(col("pid"), col("region_id"))
    }),

    "q71_morton_key" -> ((s, dir) => {
      // the Z-order layout key (16-bit-per-axis Morton interleave) —
      // every shift/mask step int64-exact, the float grid step pinned
      // (add, divide, multiply, floor); LayoutSpec measures the >=4x
      // scan pruning the key buys
      Synth.points(s, dir).select(col("pid"),
        graft.operators.Layout.mortonKey(col("lon"), col("lat")).as("zkey"))
    })
  )

  // --------------------------------------------------------------------
  // DuckDB oracles — column names must match the Spark outputs exactly.
  // --------------------------------------------------------------------

  private val P = Synth.pointsCte
  private val R = Synth.regionsCte

  /** q33's composed cmd/main.go pipeline CTEs — tile extents (3857), the
    * synthetic box/bow-tie features, the bow-tie diagonal intersection,
    * mm-rounded makevalid vertices, pixel projection, and the final MVT
    * command stream per feature (`cm`: pid, tx, ty, cmds). Shared by the
    * q33 command-stream oracle and the q43 tile-bytes oracle.
    */
  private val q33CmdsCtes: String = {
    def zz(v: String) = s"(CASE WHEN ($v) >= 0 THEN 2 * ($v) ELSE (-2 * ($v)) - 1 END)"
    def y2deg(ty: String) =
      s"((180.0 / pi()) * atan(0.5 * (exp(pi() - (((2.0 * pi()) * CAST($ty AS DOUBLE)) / 512.0)) - " +
      s"exp(-(pi() - (((2.0 * pi()) * CAST($ty AS DOUBLE)) / 512.0))))))"
    def mercX(lon: String) = s"(6378137.0 * ((($lon) * pi()) / 180))"
    def mercY(lat: String) = s"(6378137.0 * ln(tan((pi() / 4) + ((($lat) * pi()) / 180) / 2)))"
    def x2deg(tx: String) = s"(((CAST($tx AS DOUBLE) / 512.0) * 360.0) - 180.0)"
    // pixel projection of an mm-rounded coordinate
    def pxOf(x: String) = s"CAST(trunc(((($x) - tminx) / xs) * 4096.0) AS BIGINT)"
    def pyOf(y: String) = s"CAST(trunc(((tmaxy - ($y)) / ys) * 4096.0) AS BIGINT)"
    def mm(v: String) = s"(round(($v) * 1000) / 1000.0)"
    (s"WITH $P, b0 AS (SELECT pid, (pid * 7) % 512 AS tx, (pid % 312) + 100 AS ty FROM pts), " +
    s"t0 AS (SELECT pid, tx, ty, ${mercX(x2deg("tx"))} AS tminx, ${mercX(x2deg("tx + 1"))} AS tmaxx, " +
    s"${mercY(y2deg("ty + 1"))} AS tminy, ${mercY(y2deg("ty"))} AS tmaxy FROM b0), " +
    "t1 AS (SELECT pid, tx, ty, tminx, tminy, tmaxx, tmaxy, tmaxx - tminx AS xs, tmaxy - tminy AS ys FROM t0), " +
    "g0 AS (SELECT pid, tx, ty, tminx, tmaxy, xs, ys, " +
    "tminx + (((pid % 8) * 0.05) + 0.1) * xs AS gl, " +
    "tminy + (((pid % 9) * 0.05) + 0.1) * ys AS gt FROM t1), " +
    "g1 AS (SELECT pid, tx, ty, tminx, tmaxy, xs, ys, gl, gt, " +
    "gl + (((pid % 4) * 0.05) + 0.25) * xs AS ga, " +
    "gt + (((pid % 6) * 0.04) + 0.25) * ys AS gb FROM g0), " +
    // bow-tie diagonal intersection (segmentIntersect(l1=(A,T)->(L,B), l2=(L,T)->(A,B)))
    "g2 AS (SELECT *, ((ga * gb) - (gt * gl)) AS cross1, ((gl * gb) - (gt * ga)) AS cross2 FROM g1), " +
    "g3 AS (SELECT *, " +
    "((cross1 * (gl - ga)) - ((ga - gl) * cross2)) / (((ga - gl) * (gt - gb)) - ((gt - gb) * (gl - ga))) AS bx, " +
    "((cross1 * (gt - gb)) - ((gt - gb) * cross2)) / (((ga - gl) * (gt - gb)) - ((gt - gb) * (gl - ga))) AS by " +
    "FROM g2), " +
    // pixel coordinates of the mm-rounded makevalid vertices
    s"px AS (SELECT pid, tx, ty, ${pxOf(mm("gl"))} AS pl, ${pxOf(mm("ga"))} AS pa, ${pxOf(mm("bx"))} AS pc, " +
    s"${pyOf(mm("gt"))} AS qt, ${pyOf(mm("gb"))} AS qb, ${pyOf(mm("by"))} AS qc FROM g3), " +
    "cm AS (SELECT pid, tx, ty, CASE WHEN pid % 2 = 0 THEN " +
    s"[9, ${zz("pl")}, ${zz("qb")}, 26, ${zz("pa - pl")}, ${zz("qb - qb")}, ${zz("pa - pa")}, ${zz("qt - qb")}, ${zz("pl - pa")}, ${zz("qt - qt")}, 15] " +
    "ELSE " +
    s"[9, ${zz("pa")}, ${zz("qb")}, 18, ${zz("pa - pa")}, ${zz("qt - qb")}, ${zz("pc - pa")}, ${zz("qc - qt")}, 15, " +
    s"9, ${zz("pl - pc")}, ${zz("qb - qc")}, 18, ${zz("pc - pl")}, ${zz("qc - qb")}, ${zz("pl - pc")}, ${zz("qt - qc")}, 15] END AS cmds FROM px)")
  }

  /** q44's DuckDB pair derivation, shared verbatim by q49's clustering
    * oracle: 16-perm MinHash signatures, 4×4 banding, first-shared-band
    * candidate dedupe, estimated-Jaccard ≥ 0.5 verify.
    */
  /** documents → word-3-shingle hash lists (`h(doc_id, hs)`) — the DuckDB
    * replay of the `shingle_hashes` expression, shared by the near-dup and
    * decontamination oracles.
    */
  private val shingleCtes: String =
    ("w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS words FROM documents), "
    + "sh AS (SELECT doc_id, CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')] "
    + "ELSE list_transform(range(1, len(words) - 1), i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END AS shingles FROM w), "
    + "h AS (SELECT doc_id, list_transform(shingles, s -> list_reduce(list_prepend(CAST(0 AS BIGINT), "
    + "list_transform(range(1, CAST(length(s) AS BIGINT) + 1), j -> CAST(ascii(substr(s, CAST(j AS INTEGER), 1)) AS BIGINT))), "
    + "(acc, c) -> ((acc * 31) + c) % 1000000007)) AS hs FROM sh)")

  private val neardupPairCtes: String =
    (shingleCtes + ", "
    + "sg AS (SELECT doc_id, [list_min(list_transform(hs, h -> ((1 * h) + 1) % 1000000007)), list_min(list_transform(hs, h -> ((3 * h) + 2) % 1000000007)), list_min(list_transform(hs, h -> ((5 * h) + 5) % 1000000007)), list_min(list_transform(hs, h -> ((7 * h) + 10) % 1000000007)), list_min(list_transform(hs, h -> ((9 * h) + 17) % 1000000007)), list_min(list_transform(hs, h -> ((11 * h) + 26) % 1000000007)), list_min(list_transform(hs, h -> ((13 * h) + 37) % 1000000007)), list_min(list_transform(hs, h -> ((15 * h) + 50) % 1000000007)), list_min(list_transform(hs, h -> ((17 * h) + 65) % 1000000007)), list_min(list_transform(hs, h -> ((19 * h) + 82) % 1000000007)), list_min(list_transform(hs, h -> ((21 * h) + 101) % 1000000007)), list_min(list_transform(hs, h -> ((23 * h) + 122) % 1000000007)), list_min(list_transform(hs, h -> ((25 * h) + 145) % 1000000007)), list_min(list_transform(hs, h -> ((27 * h) + 170) % 1000000007)), list_min(list_transform(hs, h -> ((29 * h) + 197) % 1000000007)), list_min(list_transform(hs, h -> ((31 * h) + 226) % 1000000007))] AS sig FROM h), "
    + "bb AS (SELECT doc_id, sig, "
    + "(((((((((sig[1]) * 31 + sig[2]) % 1000000007)) * 31 + sig[3]) % 1000000007)) * 31 + sig[4]) % 1000000007) AS h0, (((((((((sig[5]) * 31 + sig[6]) % 1000000007)) * 31 + sig[7]) % 1000000007)) * 31 + sig[8]) % 1000000007) AS h1, (((((((((sig[9]) * 31 + sig[10]) % 1000000007)) * 31 + sig[11]) % 1000000007)) * 31 + sig[12]) % 1000000007) AS h2, (((((((((sig[13]) * 31 + sig[14]) % 1000000007)) * 31 + sig[15]) % 1000000007)) * 31 + sig[16]) % 1000000007) AS h3 FROM sg), "
    + "pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sa, b.sig AS sb, t.band "
    + "FROM bb a JOIN bb b ON a.doc_id < b.doc_id "
    + "CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) t "
    + "WHERE (CASE t.band WHEN 0 THEN a.h0 = b.h0 WHEN 1 THEN a.h1 = b.h1 WHEN 2 THEN a.h2 = b.h2 ELSE a.h3 = b.h3 END) "
    + "AND (t.band < 1 OR a.h0 <> b.h0) AND (t.band < 2 OR a.h1 <> b.h1) AND (t.band < 3 OR a.h2 <> b.h2))")

  private val neardupPairSelect: String =
    ("SELECT doc_a, doc_b, "
    + "CAST(list_sum(list_transform(range(1, 17), i -> CASE WHEN sa[CAST(i AS INTEGER)] = sb[CAST(i AS INTEGER)] THEN 1 ELSE 0 END)) AS DOUBLE) / 16 AS est_jaccard "
    + "FROM pr "
    + "WHERE CAST(list_sum(list_transform(range(1, 17), i -> CASE WHEN sa[CAST(i AS INTEGER)] = sb[CAST(i AS INTEGER)] THEN 1 ELSE 0 END)) AS DOUBLE) / 16 >= 0.5")

  def oracleSql: Map[String, String] = Map(
    "q01_tile_assign" ->
      s"WITH $P SELECT pid, lon, lat, ${Synth.lon2TileSql("lon", 15)} AS tx, ${Synth.lat2TileSql("lat", 15)} AS ty FROM pts",

    "q02_tile_rollup" ->
      s"WITH $P, t AS (SELECT ${Synth.lon2TileSql("lon", 15)} AS tx, ${Synth.lat2TileSql("lat", 15)} AS ty FROM pts) SELECT tx // 64 AS x9, ty // 64 AS y9, count(*) AS n FROM t GROUP BY 1, 2",

    "q16_tiles_for_bounds" ->
      s"WITH $R, b AS (SELECT region_id, ${Synth.lon2TileSql("minx", 7)} AS xa, ${Synth.lon2TileSql("maxx", 7)} AS xb, ${Synth.lat2TileSql("maxy", 7)} AS ya, ${Synth.lat2TileSql("miny", 7)} AS yb FROM regions) SELECT region_id, gx.x, gy.y FROM b, LATERAL (SELECT unnest(generate_series(xa, xb)) AS x) gx, LATERAL (SELECT unnest(generate_series(ya, yb)) AS y) gy",

    "q03_pip_join" ->
      s"WITH $P, $R SELECT pid, region_id FROM pts, regions WHERE lon >= minx AND lon <= maxx AND lat >= miny AND lat <= maxy",

    "q04_envelope_agg" ->
      s"WITH $P SELECT l_suppkey, min(lon) AS minx, min(lat) AS miny, max(lon) AS maxx, max(lat) AS maxy, count(*) AS n FROM pts GROUP BY l_suppkey",

    "q05_clip_points" ->
      s"WITH $P SELECT pid, lon, lat FROM pts WHERE lon >= -60 AND lon <= 60 AND lat >= -60 AND lat <= 60",

    "q06_winding" ->
      s"WITH $P, t AS (SELECT pid, lon2 - lon AS bx, lat2 - lat AS by, lon2 - lon AS cx, lat - lat AS cy FROM pts), x AS (SELECT pid, (((cx * 0.0) - (0.0 * cy)) + ((0.0 * by) - (bx * 0.0))) + ((bx * cy) - (cx * by)) AS s FROM t) SELECT pid, CASE WHEN s = 0 THEN 0 WHEN signbit(s) THEN -1 ELSE 1 END AS w FROM x",

    "q07_perp_distance" ->
      s"WITH $P, t AS (SELECT pid, lon AS x1, lat AS y1, lon2 AS x2, lat2 AS y2, lon2 AS px, lat AS py FROM pts), u AS (SELECT pid, x2 - x1 AS dx, y2 - y1 AS dy, x1, y1, x2, y2, px, py FROM t) SELECT pid, CASE WHEN sqrt((dy * dy) + (dx * dx)) = 0 THEN 0.0 ELSE abs((((dy * px) - (dx * py)) + (x2 * y1)) - (y2 * x1)) / sqrt((dy * dy) + (dx * dx)) END AS d FROM u",

    "q08_seg_intersect" ->
      (s"WITH $P, t AS (SELECT pid, lon AS x1, lat AS y1, lon2 AS x2, lat2 AS y2, lon2 AS x3, lat AS y3, lon AS x4, lat2 AS y4 FROM pts), " +
      "u AS (SELECT *, ((x1 - x2) * (y3 - y4)) - ((y1 - y2) * (x3 - x4)) AS denom, (x1 * y2) - (y1 * x2) AS cr1, (x3 * y4) - (y3 * x4) AS cr2 FROM t), " +
      "v AS (SELECT pid, denom, CASE WHEN denom = 0 THEN 0.0 ELSE ((cr1 * (x3 - x4)) - ((x1 - x2) * cr2)) / denom END AS bx, " +
      "CASE WHEN denom = 0 THEN 0.0 ELSE ((cr1 * (y3 - y4)) - ((y1 - y2) * cr2)) / denom END AS by, " +
      "CASE WHEN denom = 0 THEN 0.0 ELSE (((x1 - x3) * (y3 - y4)) - ((y1 - y3) * (x3 - x4))) / denom END AS t, " +
      "CASE WHEN denom = 0 THEN 0.0 ELSE -(((x1 - x2) * (y1 - y3)) - ((y1 - y2) * (x1 - x3))) / denom END AS u FROM u) " +
      "SELECT pid, CASE WHEN bx = 0 THEN 0.0 ELSE bx END AS ix, CASE WHEN by = 0 THEN 0.0 ELSE by END AS iy, " +
      "(denom <> 0 AND u >= 0.0 AND u <= 1.0 AND t >= 0.0 AND t <= 1.0) AS ok FROM v"),

    "q09_simplify" ->
      // DP on 3 points [p0=(x1,y1), mid=(x2,y2), p2=(x2,y1)]: line p0→p2,
      // inner distance of mid; > tol keeps 3 points else 2
      (s"WITH $P, t AS (SELECT pid, lon AS x1, lat AS y1, lon2 AS x2, lat2 AS y2 FROM pts), " +
      "v AS (SELECT pid, x2 - x1 AS dx, y1 - y1 AS dy, x1, y1, x2, y2 FROM t) " +
      "SELECT pid, CASE WHEN (CASE WHEN sqrt((dy * dy) + (dx * dx)) = 0 THEN 0.0 ELSE abs((((dy * x2) - (dx * y2)) + (x2 * y1)) - (y1 * x1)) / sqrt((dy * dy) + (dx * dx)) END) > 5.0 THEN 3 ELSE 2 END AS npts FROM v"),

    "q10_dist_to_seg" ->
      (s"WITH $P, t AS (SELECT pid, lon AS vx, lat AS vy, lon2 AS wx, lat2 AS wy, lon2 AS px, lat AS py FROM pts), " +
      "u AS (SELECT *, ((wx - vx) * (wx - vx)) + ((wy - vy) * (wy - vy)) AS l2 FROM t), " +
      "v AS (SELECT *, CASE WHEN l2 = 0 THEN 0.0 ELSE greatest(0.0, least(1.0, (((px - vx) * (wx - vx)) + ((py - vy) * (wy - vy))) / l2)) END AS tt FROM u) " +
      "SELECT pid, CASE WHEN l2 = 0 THEN sqrt(((px - vx) * (px - vx)) + ((py - vy) * (py - vy))) " +
      "ELSE sqrt(((px - (vx + tt * (wx - vx))) * (px - (vx + tt * (wx - vx)))) + ((py - (vy + tt * (wy - vy))) * (py - (vy + tt * (wy - vy))))) END AS d FROM v"),

    "q11_wkt_roundtrip" ->
      s"WITH $P SELECT pid, lon AS x, lat AS y FROM pts",

    "q12_knn" ->
      (s"WITH $P, q AS (SELECT pid AS qid, lon AS qlon, lat AS qlat FROM pts WHERE pid % 2999 = 0) " +
      "SELECT qid, pid AS nid, ((qlon - lon) * (qlon - lon)) + ((qlat - lat) * (qlat - lat)) AS dist2, " +
      "CAST(row_number() OVER (PARTITION BY qid ORDER BY ((qlon - lon) * (qlon - lon)) + ((qlat - lat) * (qlat - lat)) ASC, pid ASC) AS BIGINT) AS rk " +
      "FROM q, pts WHERE qid <> pid QUALIFY rk <= 3"),

    "q15_region_envelope" ->
      s"WITH $R SELECT region_id, minx AS eminx, miny AS eminy, maxx AS emaxx, maxy AS emaxy FROM regions",

    "q17_centroid" ->
      (s"WITH $R, t AS (SELECT region_id, (minx * miny) - (maxx * miny) AS aa1, (maxx * maxy) - (maxx * miny) AS aa2, (maxx * maxy) - (minx * maxy) AS aa3, minx, miny, maxx, maxy FROM regions) " +
      "SELECT region_id, ((((minx + maxx) * aa1) + ((maxx + maxx) * aa2)) + ((maxx + minx) * aa3)) / (3 * aa3) AS cx, " +
      "((((miny + miny) * aa1) + ((miny + maxy) * aa2)) + ((maxy + maxy) * aa3)) / (3 * aa3) AS cy FROM t"),

    "q13_dedup_exact" ->
      "SELECT md5(text) AS text_md5, min(doc_id) AS keeper_id, count(*) AS n_copies FROM documents GROUP BY 1",

    "q14_text_stats" ->
      ("SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_c, " +
      "CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens, " +
      "CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+')) AS BIGINT) AS n_bpe, " +
      "CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct FROM documents"),

    "q18_fingerprint" ->
      "SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, CAST(length(text) AS BIGINT) + 1), i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT))), (acc, c) -> ((acc * 31) + c) % 1000000007) AS fp FROM documents",

    "q19_agg_baseline" ->
      "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n FROM lineitem GROUP BY 1, 2",

    "q20_join_baseline" ->
      "SELECT c_nationkey, count(*) AS n_orders FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1",

    "q21_knn_cell" ->
      (s"WITH $P, q AS (SELECT pid AS qid, lon AS qlon, lat AS qlat FROM pts WHERE lon >= -30 AND lon <= 30 AND lat >= 0 AND lat <= 40) " +
      "SELECT qid, pid AS nid, ((qlon - lon) * (qlon - lon)) + ((qlat - lat) * (qlat - lat)) AS dist2, " +
      "CAST(row_number() OVER (PARTITION BY qid ORDER BY ((qlon - lon) * (qlon - lon)) + ((qlat - lat) * (qlat - lat)) ASC, pid ASC) AS BIGINT) AS rk " +
      "FROM q, pts WHERE qid <> pid QUALIFY rk <= 3"),

    "q22_tiler_assign" ->
      (s"WITH $P, polys AS (SELECT pid, CASE WHEN pid % 194 = 0 THEN lon ELSE lon - 1.0 END AS bminx, " +
      "CASE WHEN pid % 194 = 0 THEN lat ELSE lat - 1.0 END AS bminy, " +
      "CASE WHEN pid % 194 = 0 THEN lon + 2.0 ELSE lon + 1.0 END AS bmaxx, " +
      "CASE WHEN pid % 194 = 0 THEN lat + 2.0 ELSE lat + 1.0 END AS bmaxy FROM pts WHERE pid % 97 = 0), " +
      s"b AS (SELECT pid, ${Synth.lon2TileSql("bminx", 9)} AS xa, ${Synth.lon2TileSql("bmaxx", 9)} AS xb, " +
      s"${Synth.lat2TileSql("bmaxy", 9)} AS ya, ${Synth.lat2TileSql("bminy", 9)} AS yb FROM polys), " +
      "t AS (SELECT pid, gx.x, gy.y FROM b, LATERAL (SELECT unnest(generate_series(xa, xb)) AS x) gx, " +
      "LATERAL (SELECT unnest(generate_series(ya, yb)) AS y) gy) " +
      "SELECT x, y, count(*) AS n_geoms FROM t GROUP BY 1, 2"),

    "q23_ann_cosine" ->
      ("WITH e AS (SELECT vec_id AS vid, embedding AS v FROM embeddings), " +
      "q AS (SELECT vid AS qid, v AS qv FROM e WHERE vid % 40 = 0), " +
      "p AS (SELECT qid, vid, " +
      "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, CAST(len(qv) AS BIGINT) + 1), i -> CAST(qv[CAST(i AS INTEGER)] AS DOUBLE) * CAST(v[CAST(i AS INTEGER)] AS DOUBLE))), (acc, x) -> acc + x) AS dt, " +
      "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, CAST(len(qv) AS BIGINT) + 1), i -> CAST(qv[CAST(i AS INTEGER)] AS DOUBLE) * CAST(qv[CAST(i AS INTEGER)] AS DOUBLE))), (acc, x) -> acc + x) AS nq, " +
      "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, CAST(len(v) AS BIGINT) + 1), i -> CAST(v[CAST(i AS INTEGER)] AS DOUBLE) * CAST(v[CAST(i AS INTEGER)] AS DOUBLE))), (acc, x) -> acc + x) AS nv " +
      "FROM q, e WHERE qid <> vid) " +
      "SELECT qid, vid, dt / (sqrt(nq) * sqrt(nv)) AS cos, " +
      "CAST(row_number() OVER (PARTITION BY qid ORDER BY dt / (sqrt(nq) * sqrt(nv)) DESC, vid ASC) AS BIGINT) AS rk " +
      "FROM p QUALIFY rk <= 5"),

    // 5-point DP: keepL/keepR mirror the recursion's perpendicular-distance
    // comparisons; rolling vertex hash gates which points survive and order
    "q35_simplify_dp" -> {
      val M = "1000000000000007"
      def h(x: String, y: String) =
        s"(CAST(round(($x) * 1000000.0) AS BIGINT) * 1000003 + CAST(round(($y) * 1000000.0) AS BIGINT))"
      (s"WITH $P, s AS (SELECT pid, lon, lat, lon + 1 AS x1v, lat + ((pid % 3) * 0.3) AS y1v, " +
      "lon + 2 AS x2v, lat + 2 AS y2v, lon + 3 AS x3v, lat + ((pid % 5) * 0.2) AS y3v, lon + 4 AS x4v FROM pts), " +
      "d AS (SELECT *, " +
      "abs(((((y2v - lat) * x1v) - ((x2v - lon) * y1v)) + (x2v * lat)) - (y2v * lon)) / " +
      "sqrt(((y2v - lat) * (y2v - lat)) + ((x2v - lon) * (x2v - lon))) AS dl, " +
      "abs(((((lat - y2v) * x3v) - ((x4v - x2v) * y3v)) + (x4v * y2v)) - (lat * x2v)) / " +
      "sqrt(((lat - y2v) * (lat - y2v)) + ((x4v - x2v) * (x4v - x2v))) AS dr FROM s), " +
      "k AS (SELECT *, dl > 0.5 AS keepl, dr > 0.5 AS keepr, " +
      s"${h("lon", "lat")} AS h0, ${h("x1v", "y1v")} AS h1, ${h("x2v", "y2v")} AS h2, " +
      s"${h("x3v", "y3v")} AS h3, ${h("x4v", "lat")} AS h4 FROM d), " +
      s"r1 AS (SELECT *, h0 % $M AS a1 FROM k), " +
      s"r2 AS (SELECT *, CASE WHEN keepl THEN ((a1 * 31) + h1) % $M ELSE a1 END AS a2 FROM r1), " +
      s"r3 AS (SELECT *, ((a2 * 31) + h2) % $M AS a3 FROM r2), " +
      s"r4 AS (SELECT *, CASE WHEN keepr THEN ((a3 * 31) + h3) % $M ELSE a3 END AS a4 FROM r3) " +
      "SELECT pid, CAST(3 + CAST(keepl AS INTEGER) + CAST(keepr AS INTEGER) AS INTEGER) AS npts, " +
      s"CAST(((a4 * 31) + h4) % $M AS BIGINT) AS vhash FROM r4")
    },

    // rectify: even pid rings are CCW → reversed output [p2,p1,p0];
    // odd are already CW → kept [p0,p2,p1]
    "q36_rectify" -> {
      val M = "1000000000000007"
      def h(x: String, y: String) =
        s"(CAST(round(($x) * 1000000.0) AS BIGINT) * 1000003 + CAST(round(($y) * 1000000.0) AS BIGINT))"
      (s"WITH $P, s AS (SELECT pid, ${h("lon", "lat")} AS h0, " +
      s"${h("lon + 3", "lat + 1")} AS h1, ${h("lon + 1", "lat + 2")} AS h2 FROM pts) " +
      "SELECT pid, CAST(3 AS INTEGER) AS npts, CAST(CASE WHEN pid % 2 = 0 " +
      s"THEN ((((((h2 % $M) * 31) + h1) % $M) * 31 + h0) % $M) " +
      s"ELSE ((((((h0 % $M) * 31) + h2) % $M) * 31 + h1) % $M) END AS BIGINT) AS vhash FROM s")
    },

    // clip walk: entry/exit = segmentIntersect(edge, segment) with the
    // reference −0→0 normalization, mirrored op-for-op
    "q37_clip_line" -> {
      val M = "1000000000000007"
      def h(x: String, y: String) =
        s"(CAST(round(($x) * 1000000.0) AS BIGINT) * 1000003 + CAST(round(($y) * 1000000.0) AS BIGINT))"
      (s"WITH $P, e AS (SELECT pid, lon, lat, " +
      // entry: l1 = left edge (lon,lat+2)->(lon,lat); l2 = (lon-1,lat+0.5)->(lon+1,lat+1)
      "((lon * lat) - ((lat + 2) * lon)) AS c1a, " +
      "(((lon - 1) * (lat + 1)) - ((lat + 0.5) * (lon + 1))) AS c2a, " +
      "(lon - lon) AS dx12a, ((lat + 2) - lat) AS dy12a, " +
      "((lon - 1) - (lon + 1)) AS dx34a, ((lat + 0.5) - (lat + 1)) AS dy34a, " +
      // exit: l1 = right edge (lon+2,lat)->(lon+2,lat+2); l2 = (lon+1,lat+1)->(lon+3,lat+1.5)
      "(((lon + 2) * (lat + 2)) - (lat * (lon + 2))) AS c1b, " +
      "(((lon + 1) * (lat + 1.5)) - ((lat + 1) * (lon + 3))) AS c2b, " +
      "((lon + 2) - (lon + 2)) AS dx12b, (lat - (lat + 2)) AS dy12b, " +
      "((lon + 1) - (lon + 3)) AS dx34b, ((lat + 1) - (lat + 1.5)) AS dy34b FROM pts), " +
      "f AS (SELECT pid, lon, lat, " +
      "((c1a * dx34a) - (dx12a * c2a)) / ((dx12a * dy34a) - (dy12a * dx34a)) AS ex0, " +
      "((c1a * dy34a) - (dy12a * c2a)) / ((dx12a * dy34a) - (dy12a * dx34a)) AS ey0, " +
      "((c1b * dx34b) - (dx12b * c2b)) / ((dx12b * dy34b) - (dy12b * dx34b)) AS xx0, " +
      "((c1b * dy34b) - (dy12b * c2b)) / ((dx12b * dy34b) - (dy12b * dx34b)) AS xy0 FROM e), " +
      "g AS (SELECT pid, lon, lat, " +
      "CASE WHEN ex0 = 0 THEN 0.0 ELSE ex0 END AS ex, CASE WHEN ey0 = 0 THEN 0.0 ELSE ey0 END AS ey, " +
      "CASE WHEN xx0 = 0 THEN 0.0 ELSE xx0 END AS xx, CASE WHEN xy0 = 0 THEN 0.0 ELSE xy0 END AS xy FROM f) " +
      "SELECT pid, 'MultiLineString' AS gtype, CAST(3 AS INTEGER) AS npts, " +
      s"CAST(((((((${h("ex", "ey")} % $M) * 31) + ${h("lon + 1", "lat + 1")}) % $M) * 31 + ${h("xx", "xy")}) % $M) AS BIGINT) AS vhash FROM g")
    },

    // composed cmd/main.go pipeline: tile ext (3857) → 1px clipRegion →
    // DP simplify (identity by construction: features ≥1000px) → makevalid
    // (plain path: geometry inside clipRegion; bow-ties split at the
    // diagonal intersection, all vertices rounded half-away at 1e-3) →
    // PrepareGeo pixel projection (trunc toward zero, y-flip) → MVT
    // command stream (empirically: the prepare rectify and the encoder's
    // y-down winding enforcement cancel, so rings encode in makevalid
    // output vertex order: box (L,B),(A,B),(A,T),(L,T); bow-tie
    // [(A,B),(A,T),C] then [(L,B),C,(L,T)] with the cursor carrying over)
    "q33_pipeline" -> (q33CmdsCtes +
      " SELECT pid, 3 AS mvt_type, CAST(len(cmds) AS BIGINT) AS n_cmds, " +
      "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cmds, c -> CAST(c AS BIGINT))), " +
      "(acc, c) -> ((acc * 31) + c) % 1000000000000007) AS BIGINT) AS chash FROM cm"),

    // the FINISHED MVT tile bytes: q33's commands (shared CTEs) assembled
    // into the layer/tile protobuf exactly as MvtTile.encodeLayerStream
    // writes it — feature framing, packed-varint geometry, the "fid"
    // key/value tables in first-appearance order, varint length prefixes —
    // grouped per tile in fid-string order (the sink's sort order) and
    // rolled into a byte hash (encoding/mvt/layer.go:15-131, tile.go:45-63)
    "q43_mvt_tile_bytes" -> {
      // varint → byte list (values here are < 2^35)
      def vb(v: String) = s"(CASE WHEN ($v) < 128 THEN [($v)] " +
        s"WHEN ($v) < 16384 THEN [(($v) % 128) + 128, ($v) // 128] " +
        s"WHEN ($v) < 2097152 THEN [(($v) % 128) + 128, ((($v) // 128) % 128) + 128, ($v) // 16384] " +
        s"WHEN ($v) < 268435456 THEN [(($v) % 128) + 128, ((($v) // 128) % 128) + 128, " +
        s"((($v) // 16384) % 128) + 128, ($v) // 2097152] " +
        s"ELSE [(($v) % 128) + 128, ((($v) // 128) % 128) + 128, ((($v) // 16384) % 128) + 128, " +
        s"((($v) // 2097152) % 128) + 128, ($v) // 268435456] END)"
      val utf8 = "list_transform(range(1, CAST(length(fids) AS BIGINT) + 1), " +
        "j -> CAST(ascii(substr(fids, CAST(j AS INTEGER), 1)) AS BIGINT))"
      (q33CmdsCtes + ", " +
      // cmds → geometry bytes; vi = 0-based feature index in fid order
      "cmd AS (SELECT DISTINCT pid, tx, ty, cmds FROM cm), " +
      "ff AS (SELECT pid, tx, ty, CAST(pid AS VARCHAR) AS fids, " +
      "CAST(ROW_NUMBER() OVER (PARTITION BY tx, ty ORDER BY CAST(pid AS VARCHAR) ASC) - 1 AS BIGINT) AS vi, " +
      s"flatten(list_transform(cmds, c -> ${vb("CAST(c AS BIGINT)")})) AS gb FROM cmd), " +
      // feature message: id (field1) = vi+1, packed tags [0, vi] (field2),
      // geom_type 3 (field3), packed geometry (field4)
      s"f1 AS (SELECT *, ([0] || ${vb("vi")}) AS taginner FROM ff), " +
      s"f2 AS (SELECT pid, tx, ty, fids, vi, " +
      s"([8] || ${vb("vi + 1")} || [18] || ${vb("len(taginner)")} || taginner || [24, 3] || " +
      s"[34] || ${vb("len(gb)")} || gb) AS feat, " +
      s"([10, CAST(length(fids) AS BIGINT)] || $utf8) AS valb FROM f1), " +
      // layer: version, name "features", features, key "fid", values, extent
      s"lt AS (SELECT tx, ty, " +
      s"flatten(list([18] || ${vb("len(feat)")} || feat ORDER BY fids ASC)) AS fb, " +
      s"flatten(list([34] || ${vb("len(valb)")} || valb ORDER BY fids ASC)) AS vbb " +
      "FROM f2 GROUP BY tx, ty), " +
      "ly AS (SELECT tx, ty, ([120, 2, 10, 8, 102, 101, 97, 116, 117, 114, 101, 115] || fb || " +
      "[26, 3, 102, 105, 100] || vbb || [40, 128, 32]) AS lb FROM lt), " +
      s"tb AS (SELECT tx, ty, ([26] || ${vb("len(lb)")} || lb) AS tbytes FROM ly) " +
      "SELECT CAST(tx AS BIGINT) AS x, CAST(ty AS BIGINT) AS y, " +
      "CAST(len(tbytes) AS BIGINT) AS n_bytes, " +
      "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(tbytes, c -> CAST(c AS BIGINT))), " +
      "(acc, c) -> ((acc * 31) + c) % 1000000000000007) AS BIGINT) AS bhash FROM tb")
    },

    // q43 + TYPED tag values: every feature carries fid:string, pid:int64
    // (Value field 4, varint), score:double (field 3, fixed64 LE of the
    // IEEE-754 bits — score = pid/4 + 0.5 is exactly dyadic so the bits
    // are integer-computable), even:bool (field 7). The two bool values
    // dedupe ACROSS features (reference feature.go:360-576), so value
    // indices need the first-appearance bookkeeping: feature at rank vi
    // contributes 3 always-new values plus a bool value only when its
    // parity appears first in the tile.
    "q45_mvt_typed_tags" -> {
      def vb(v: String) = s"(CASE WHEN ($v) < 128 THEN [($v)] " +
        s"WHEN ($v) < 16384 THEN [(($v) % 128) + 128, ($v) // 128] " +
        s"WHEN ($v) < 2097152 THEN [(($v) % 128) + 128, ((($v) // 128) % 128) + 128, ($v) // 16384] " +
        s"WHEN ($v) < 268435456 THEN [(($v) % 128) + 128, ((($v) // 128) % 128) + 128, " +
        s"((($v) // 16384) % 128) + 128, ($v) // 2097152] " +
        s"ELSE [(($v) % 128) + 128, ((($v) // 128) % 128) + 128, ((($v) // 16384) % 128) + 128, " +
        s"((($v) // 2097152) % 128) + 128, ($v) // 268435456] END)"
      val utf8 = "list_transform(range(1, CAST(length(fids) AS BIGINT) + 1), " +
        "j -> CAST(ascii(substr(fids, CAST(j AS INTEGER), 1)) AS BIGINT))"
      (q33CmdsCtes + ", " +
      "cmd AS (SELECT DISTINCT pid, tx, ty, cmds FROM cm), " +
      "ff0 AS (SELECT pid, tx, ty, CAST(pid AS VARCHAR) AS fids, pid % 2 AS par, " +
      "CAST(ROW_NUMBER() OVER (PARTITION BY tx, ty ORDER BY CAST(pid AS VARCHAR) ASC) - 1 AS BIGINT) AS vi, " +
      s"flatten(list_transform(cmds, c -> ${vb("CAST(c AS BIGINT)")})) AS gb FROM cmd), " +
      // first-appearance bookkeeping: base = 3·vi + #bool-values already
      // emitted before this rank; bidx = value index of this parity's bool
      "ff1 AS (SELECT *, CASE WHEN vi = min(vi) OVER (PARTITION BY tx, ty, par) THEN 1 ELSE 0 END AS firstpar FROM ff0), " +
      "ff2 AS (SELECT *, 3 * vi + COALESCE(SUM(firstpar) OVER (PARTITION BY tx, ty ORDER BY vi ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT)) AS vbase FROM ff1), " +
      "ff3 AS (SELECT *, MIN(CASE WHEN firstpar = 1 THEN vbase + 3 END) OVER (PARTITION BY tx, ty, par) AS bidx FROM ff2), " +
      // IEEE-754 bits of score = (pid+2)/4: normalized n·2^(-2) with
      // n = pid+2, k = floor(log2 n) ⇒ bits = (1020+k)·2^52 + n·2^(52-k)
      "dd AS (SELECT *, CAST(floor(log2(CAST(pid + 2 AS DOUBLE))) AS BIGINT) AS kk FROM ff3), " +
      "de AS (SELECT *, ((1020 + kk) << 52) + ((pid + 2) << (52 - CAST(kk AS INTEGER))) AS dbits FROM dd), " +
      // per-feature Value messages in assignment order: string, int,
      // double, (+ bool when first of its parity); each framed as layer
      // field 4 ([34] len msg)
      s"vm AS (SELECT *, ([10, CAST(length(fids) AS BIGINT)] || $utf8) AS fidmsg, " +
      s"([32] || ${vb("pid")}) AS pidmsg, " +
      "([25] || list_transform(range(0, 8), j -> (dbits >> (8 * CAST(j AS INTEGER))) & 255)) AS dblmsg FROM de), " +
      s"vv AS (SELECT *, ([34] || ${vb("len(fidmsg)")} || fidmsg || [34] || ${vb("len(pidmsg)")} || pidmsg || [34, 9] || dblmsg || " +
      "CASE WHEN firstpar = 1 THEN [34, 2, 56, CASE WHEN par = 0 THEN 1 ELSE 0 END] ELSE CAST([] AS BIGINT[]) END) AS valb FROM vm), " +
      // packed tags: keys fid=0 pid=1 score=2 even=3
      s"tg AS (SELECT *, ([0] || ${vb("vbase")} || [1] || ${vb("vbase + 1")} || [2] || ${vb("vbase + 2")} || [3] || ${vb("bidx")}) AS taginner FROM vv), " +
      s"f2 AS (SELECT pid, tx, ty, fids, vi, valb, " +
      s"([8] || ${vb("vi + 1")} || [18] || ${vb("len(taginner)")} || taginner || [24, 3] || " +
      s"[34] || ${vb("len(gb)")} || gb) AS feat FROM tg), " +
      s"lt AS (SELECT tx, ty, " +
      s"flatten(list([18] || ${vb("len(feat)")} || feat ORDER BY fids ASC)) AS fb, " +
      s"flatten(list(valb ORDER BY fids ASC)) AS vbb " +
      "FROM f2 GROUP BY tx, ty), " +
      // keys: \"fid\" \"pid\" \"score\" \"even\" in first-use order
      "ly AS (SELECT tx, ty, ([120, 2, 10, 8, 102, 101, 97, 116, 117, 114, 101, 115] || fb || " +
      "[26, 3, 102, 105, 100, 26, 3, 112, 105, 100, 26, 5, 115, 99, 111, 114, 101, 26, 4, 101, 118, 101, 110] || " +
      "vbb || [40, 128, 32]) AS lb FROM lt), " +
      s"tb AS (SELECT tx, ty, ([26] || ${vb("len(lb)")} || lb) AS tbytes FROM ly) " +
      "SELECT CAST(tx AS BIGINT) AS x, CAST(ty AS BIGINT) AS y, " +
      "CAST(len(tbytes) AS BIGINT) AS n_bytes, " +
      "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(tbytes, c -> CAST(c AS BIGINT))), " +
      "(acc, c) -> ((acc * 31) + c) % 1000000000000007) AS BIGINT) AS bhash FROM tb")
    },
    // the GeoJSON Feature wire string rebuilt character-for-character in
    // SQL (quarter-quantized coords make Java/DuckDB double formatting
    // agree), hashed with the q43 rolling hash over ascii codes
    "q46_geojson_feature" -> {
      val hash = "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(range(1, CAST(length(json) AS BIGINT) + 1), " +
        "i -> CAST(ascii(substr(json, CAST(i AS INTEGER), 1)) AS BIGINT))), " +
        "(acc, c) -> ((acc * 31) + c) % 1000000000000007) AS BIGINT)"
      (s"WITH $P, f AS (SELECT pid, floor(lon * 4) / 4 AS x, floor(lat * 4) / 4 AS y FROM pts), " +
      "j AS (SELECT pid, '{\"type\":\"Feature\",\"id\":' || CAST(pid AS VARCHAR) || " +
      "',\"geometry\":{\"type\":\"Point\",\"coordinates\":[' || CAST(x AS VARCHAR) || ',' || " +
      "CAST(y AS VARCHAR) || ']},\"properties\":{\"name\":\"p' || CAST(pid AS VARCHAR) || " +
      "'\",\"rank\":' || CAST(pid % 100 AS VARCHAR) || '}}' AS json FROM f) " +
      s"SELECT pid, CAST(length(json) AS BIGINT) AS n_chars, $hash AS jhash, " +
      "pid AS rid, pid % 100 AS rrank FROM j")
    },

    // the one-pass LSH near-dup pairs: 16-perm MinHash signatures (the
    // q24 permutation family), 4 bands x 4 rows, candidate pairs from
    // shared band buckets, emitted only from the FIRST shared band,
    // verified by estimated Jaccard >= 0.5
    "q44_neardup_pairs" -> s"WITH $neardupPairCtes $neardupPairSelect",

    // near-dup pairs clustered into components: the q44 pair derivation
    // verbatim as a CTE, closed transitively with a recursive CTE (UNION
    // set semantics terminate it), rep = min reachable id, singletons
    // joined back from documents with csize 1
    "q49_neardup_clusters" -> {
      (s"WITH RECURSIVE $neardupPairCtes, "
      + s"pairs AS ($neardupPairSelect), "
      + "sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b AS a, doc_a AS b FROM pairs), "
      + "reach(a, b) AS (SELECT a, b FROM sym "
      + "UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a), "
      + "root AS (SELECT a, least(a, min(b)) AS rep FROM reach GROUP BY a), "
      + "cl AS (SELECT d.doc_id AS doc, COALESCE(r.rep, d.doc_id) AS rep "
      + "FROM documents d LEFT JOIN root r ON r.a = d.doc_id) "
      + "SELECT doc, rep, CAST(count(*) OVER (PARTITION BY rep) AS BIGINT) AS csize, "
      + "doc = rep AS keeper FROM cl")
    },

    // decontamination: distinct-shingle overlap of every doc against the
    // doc_id%97 benchmark slice, replayed with the shared shingle CTEs
    "q50_decontaminate" -> {
      (s"WITH $shingleCtes, "
      + "d AS (SELECT doc_id, list_distinct(hs) AS hs FROM h), "
      + "bl AS (SELECT list(DISTINCT s) AS l FROM (SELECT unnest(hs) AS s FROM d WHERE doc_id % 97 = 0)), "
      + "c AS (SELECT doc_id AS doc, len(hs) AS n_sh, "
      + "len(list_filter(hs, x -> list_contains(bl.l, x))) AS hits FROM d CROSS JOIN bl) "
      + "SELECT doc, CAST(n_sh AS BIGINT) AS n_sh, CAST(hits AS BIGINT) AS hits, "
      + "hits >= 2 AS contaminated FROM c")
    },

    "q51_quota_sample" ->
      ("SELECT doc_id, source, n_chars, rk FROM (SELECT doc_id, source, n_chars, "
      + "CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rk "
      + "FROM documents) WHERE rk <= 5"),

    // WKB wire bytes rebuilt in SQL: LE marker+type words as literal byte
    // lists, quarter-valued doubles as exact IEEE-754 bit arithmetic
    "q52_wkb_bytes" -> {
      def dbits(n: String) =
        (s"(((1020 + CAST(floor(log2(CAST($n AS DOUBLE))) AS BIGINT)) << 52) + "
        + s"(CAST($n AS BIGINT) << (52 - CAST(floor(log2(CAST($n AS DOUBLE))) AS INTEGER))))")
      def dbl(n: String) =
        s"list_transform(range(0, 8), j -> (${dbits(n)} >> (8 * CAST(j AS INTEGER))) & 255)"
      def hash(bytes: String) =
        (s"CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($bytes, "
        + "c -> CAST(c AS BIGINT))), (acc, c) -> ((acc * 31) + c) % 1000000000000007) AS BIGINT)")
      (s"WITH $P, b AS (SELECT pid, pid + 1 AS nx, pid + 2 AS ny, pid + 7 AS nxx, pid + 11 AS nyy "
      + "FROM pts WHERE pid % 7 = 0), "
      // pt: marker 1, type 1, x=(pid+1)/4, y=(pid+2)/4
      + s"w AS (SELECT pid, ([1, 1, 0, 0, 0] || ${dbl("nx")} || ${dbl("ny")}) AS ptb, "
      // box polygon: type 3, 1 ring, 5 pts CW (minx,miny)(maxx,miny)
      // (maxx,maxy)(minx,maxy)(close); maxx=x+1.5=(pid+7)/4, maxy=y+2.25=(pid+11)/4
      + s"([1, 3, 0, 0, 0, 1, 0, 0, 0, 5, 0, 0, 0] || ${dbl("nx")} || ${dbl("ny")} || "
      + s"${dbl("nxx")} || ${dbl("ny")} || ${dbl("nxx")} || ${dbl("nyy")} || "
      + s"${dbl("nx")} || ${dbl("nyy")} || ${dbl("nx")} || ${dbl("ny")}) AS boxb FROM b) "
      + s"SELECT pid, CAST(len(ptb) AS BIGINT) AS n_pt, ${hash("ptb")} AS pt_hash, "
      + s"CAST(len(boxb) AS BIGINT) AS n_box, ${hash("boxb")} AS box_hash FROM w")
    },
    // exact n-gram Jaccard: q44's band machinery as the recall stage (any
    // shared band, first-shared-band dedupe, NO estimate threshold), then
    // exact shingle-set Jaccard — distinct intersection over distinct union
    "q47_neardup_exact" -> {
      ("WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS words FROM documents), "
      + "sh AS (SELECT doc_id, CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')] "
      + "ELSE list_transform(range(1, len(words) - 1), i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END AS shingles FROM w), "
      + "h AS (SELECT doc_id, list_transform(shingles, s -> list_reduce(list_prepend(CAST(0 AS BIGINT), "
      + "list_transform(range(1, CAST(length(s) AS BIGINT) + 1), j -> CAST(ascii(substr(s, CAST(j AS INTEGER), 1)) AS BIGINT))), "
      + "(acc, c) -> ((acc * 31) + c) % 1000000007)) AS hs FROM sh), "
      + "sg AS (SELECT doc_id, hs, [list_min(list_transform(hs, h -> ((1 * h) + 1) % 1000000007)), list_min(list_transform(hs, h -> ((3 * h) + 2) % 1000000007)), list_min(list_transform(hs, h -> ((5 * h) + 5) % 1000000007)), list_min(list_transform(hs, h -> ((7 * h) + 10) % 1000000007)), list_min(list_transform(hs, h -> ((9 * h) + 17) % 1000000007)), list_min(list_transform(hs, h -> ((11 * h) + 26) % 1000000007)), list_min(list_transform(hs, h -> ((13 * h) + 37) % 1000000007)), list_min(list_transform(hs, h -> ((15 * h) + 50) % 1000000007)), list_min(list_transform(hs, h -> ((17 * h) + 65) % 1000000007)), list_min(list_transform(hs, h -> ((19 * h) + 82) % 1000000007)), list_min(list_transform(hs, h -> ((21 * h) + 101) % 1000000007)), list_min(list_transform(hs, h -> ((23 * h) + 122) % 1000000007)), list_min(list_transform(hs, h -> ((25 * h) + 145) % 1000000007)), list_min(list_transform(hs, h -> ((27 * h) + 170) % 1000000007)), list_min(list_transform(hs, h -> ((29 * h) + 197) % 1000000007)), list_min(list_transform(hs, h -> ((31 * h) + 226) % 1000000007))] AS sig FROM h), "
      + "bb AS (SELECT doc_id, hs, sig, "
      + "(((((((((sig[1]) * 31 + sig[2]) % 1000000007)) * 31 + sig[3]) % 1000000007)) * 31 + sig[4]) % 1000000007) AS h0, (((((((((sig[5]) * 31 + sig[6]) % 1000000007)) * 31 + sig[7]) % 1000000007)) * 31 + sig[8]) % 1000000007) AS h1, (((((((((sig[9]) * 31 + sig[10]) % 1000000007)) * 31 + sig[11]) % 1000000007)) * 31 + sig[12]) % 1000000007) AS h2, (((((((((sig[13]) * 31 + sig[14]) % 1000000007)) * 31 + sig[15]) % 1000000007)) * 31 + sig[16]) % 1000000007) AS h3 FROM sg), "
      + "pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.hs AS ha, b.hs AS hb "
      + "FROM bb a JOIN bb b ON a.doc_id < b.doc_id "
      + "CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) t "
      + "WHERE (CASE t.band WHEN 0 THEN a.h0 = b.h0 WHEN 1 THEN a.h1 = b.h1 WHEN 2 THEN a.h2 = b.h2 ELSE a.h3 = b.h3 END) "
      + "AND (t.band < 1 OR a.h0 <> b.h0) AND (t.band < 2 OR a.h1 <> b.h1) AND (t.band < 3 OR a.h2 <> b.h2)), "
      + "ex AS (SELECT doc_a, doc_b, "
      + "CAST(len(list_filter(list_distinct(ha), x -> list_contains(hb, x))) AS DOUBLE) AS inter, "
      + "CAST(len(list_distinct(ha || hb)) AS DOUBLE) AS uni FROM pr) "
      + "SELECT doc_a, doc_b, inter / uni AS jaccard FROM ex WHERE inter / uni >= 0.5")
    },

    "q34_ann_lsh" -> {
      ("WITH e AS (SELECT vec_id AS vid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
      s"b AS (SELECT vid, v, ${graft.operators.Ann.bucketSql("v", 64, 8)} AS bucket FROM e), " +
      "q AS (SELECT vid AS qid, v AS qv, bucket AS qb FROM b WHERE vid % 40 = 0), " +
      "qp AS (SELECT qid, qv, unnest([qb" + (0 until 8).map(p => s", xor(qb, ${1L << p})").mkString + "]) AS bucket FROM q), " +
      "p AS (SELECT qid, vid, " +
      "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), i -> qv[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])), (acc, x) -> acc + x) AS dt, " +
      "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), i -> qv[CAST(i AS INTEGER)] * qv[CAST(i AS INTEGER)])), (acc, x) -> acc + x) AS nq, " +
      "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), i -> v[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])), (acc, x) -> acc + x) AS nv " +
      "FROM qp JOIN b USING (bucket) WHERE qid <> vid) " +
      "SELECT qid, vid, dt / (sqrt(nq) * sqrt(nv)) AS cos, " +
      "CAST(row_number() OVER (PARTITION BY qid ORDER BY dt / (sqrt(nq) * sqrt(nv)) DESC, vid ASC) AS BIGINT) AS rk " +
      "FROM p QUALIFY rk <= 5")
    },

    "q24_minhash_sig" ->
      ("WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS words FROM documents), " +
      "sh AS (SELECT doc_id, CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')] " +
      "ELSE list_transform(range(1, len(words) - 1), i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) END AS shingles FROM w), " +
      "h AS (SELECT doc_id, list_transform(shingles, s -> list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(range(1, CAST(length(s) AS BIGINT) + 1), j -> CAST(ascii(substr(s, CAST(j AS INTEGER), 1)) AS BIGINT))), " +
      "(acc, c) -> ((acc * 31) + c) % 1000000007)) AS hs FROM sh) " +
      "SELECT doc_id, " + (0 until 8).map(i =>
        s"list_min(list_transform(hs, h -> ((${2 * i + 1} * h) + ${i * i + 1}) % 1000000007)) AS s$i")
        .mkString(", ") + " FROM h"),

    "q25_simhash" ->
      ("WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS words FROM documents), " +
      "h AS (SELECT doc_id, list_transform(words, s -> list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(range(1, CAST(length(s) AS BIGINT) + 1), j -> CAST(ascii(substr(s, CAST(j AS INTEGER), 1)) AS BIGINT))), " +
      "(acc, c) -> ((acc * 31) + c) % 1000000007)) AS hs FROM w) " +
      "SELECT doc_id, CAST(list_sum(list_transform(range(0, 31), b -> " +
      "CASE WHEN CAST(list_sum(list_transform(hs, h -> CASE WHEN (h // (CAST(1 AS BIGINT) << b)) % 2 = 1 THEN 1 ELSE -1 END)) AS BIGINT) > 0 " +
      "THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sh FROM h"),

    "q26_sessions" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events), " +
      "x AS (SELECT user_id, event_id, ts_us, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC) AS prev_ts FROM e), " +
      "y AS (SELECT user_id, event_id, ts_us, CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM x), " +
      "z AS (SELECT user_id, ts_us, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM y) " +
      "SELECT user_id, session_id, count(*) AS n_events, min(ts_us) AS t_start_us, max(ts_us) AS t_end_us FROM z GROUP BY 1, 2"),

    "q27_media_meta" ->
      ("SELECT doc_id AS media_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
      "CAST(16 + octet_length(encode(text)) % 1017 AS INTEGER) AS width, " +
      "CAST(16 + (octet_length(encode(text)) * 31) % 1017 AS INTEGER) AS height, " +
      "CAST(1 + doc_id % 24 AS INTEGER) AS n_frames FROM documents"),

    "q28_lang_score" ->
      ("WITH p AS (SELECT doc_id, text, ' ' || lower(text) || ' ' AS pad FROM documents), " +
      "h AS (SELECT doc_id, CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens, " +
      "CAST((length(pad) - length(regexp_replace(pad, ' the ', ' x', 'g'))) / 3 AS BIGINT) + " +
      "CAST((length(pad) - length(regexp_replace(pad, ' and ', ' x', 'g'))) / 3 AS BIGINT) + " +
      "CAST((length(pad) - length(regexp_replace(pad, ' of ', ' x', 'g'))) / 2 AS BIGINT) + " +
      "CAST((length(pad) - length(regexp_replace(pad, ' to ', ' x', 'g'))) / 2 AS BIGINT) AS stop_hits FROM p) " +
      "SELECT doc_id, n_tokens, stop_hits, CAST(stop_hits AS DOUBLE) / n_tokens AS score, " +
      "(CAST(stop_hits AS DOUBLE) / n_tokens) >= 0.05 AS is_en FROM h"),

    // valid box polygons repair to themselves (1 polygon, 4 points);
    // bow-ties split into two triangles (6 points: 4 corners + the diagonal
    // intersection twice). vhash predicts every output vertex: corners are
    // the generated coords ±1/+2; the intersection is segmentIntersect
    // (planar/line_intersect.go:141-178) of ring edges s3=(A,T)→(L,B) and
    // s1=(L,T)→(A,B) — the sweep's (seg, seg1) argument order — mirrored
    // op-for-op; all vertices then rounded half-away at 1e-3
    // (subdivision.go RoundingFactor).
    "q29_makevalid" ->
      (s"WITH $P, g AS (SELECT pid, " +
      "CASE WHEN pid % 194 = 0 THEN lon ELSE lon - 1 END AS gl, " +
      "CASE WHEN pid % 194 = 0 THEN lat ELSE lat - 1 END AS gt, " +
      "CASE WHEN pid % 194 = 0 THEN lon + 2 ELSE lon + 1 END AS ga, " +
      "CASE WHEN pid % 194 = 0 THEN lat + 2 ELSE lat + 1 END AS gb " +
      "FROM pts WHERE pid % 97 = 0), " +
      "x AS (SELECT pid, gl, gt, ga, gb, " +
      "((ga * gb) - (gt * gl)) AS cross1, ((gl * gb) - (gt * ga)) AS cross2 FROM g), " +
      "c AS (SELECT pid, gl, gt, ga, gb, " +
      "((cross1 * (gl - ga)) - ((ga - gl) * cross2)) / (((ga - gl) * (gt - gb)) - ((gt - gb) * (gl - ga))) AS bx, " +
      "((cross1 * (gt - gb)) - ((gt - gb) * cross2)) / (((ga - gl) * (gt - gb)) - ((gt - gb) * (gl - ga))) AS by " +
      "FROM x), " +
      "h AS (SELECT pid, " +
      "(CAST(round(gl * 1000) AS BIGINT) * 1000003 + CAST(round(gt * 1000) AS BIGINT)) + " +
      "(CAST(round(ga * 1000) AS BIGINT) * 1000003 + CAST(round(gt * 1000) AS BIGINT)) + " +
      "(CAST(round(gl * 1000) AS BIGINT) * 1000003 + CAST(round(gb * 1000) AS BIGINT)) + " +
      "(CAST(round(ga * 1000) AS BIGINT) * 1000003 + CAST(round(gb * 1000) AS BIGINT)) + " +
      "CASE WHEN pid % 194 = 0 THEN 2 * (CAST(round(bx * 1000) AS BIGINT) * 1000003 + CAST(round(by * 1000) AS BIGINT)) ELSE 0 END AS vhash " +
      "FROM c) " +
      "SELECT 'doc-' || lpad(CAST(pid AS VARCHAR), 12, '0') AS doc_id, " +
      "'MultiPolygon' AS gtype, CASE WHEN pid % 194 = 0 THEN 6 ELSE 4 END AS npts, " +
      "CAST(vhash AS BIGINT) AS vhash FROM h"),

    "q30_mvt_prepare" ->
      (s"WITH $P, t AS (SELECT pid, lon, lat, ${Synth.lon2TileSql("lon", 9)} AS x, ${Synth.lat2TileSql("lat", 9)} AS y FROM pts), " +
      "e AS (SELECT pid, lon, lat, ((CAST(x AS DOUBLE) / 512.0) * 360.0) - 180.0 AS tminx, " +
      "((CAST(x + 1 AS DOUBLE) / 512.0) * 360.0) - 180.0 AS tmaxx, " +
      "(180.0 / pi()) * atan(0.5 * (exp(pi() - ((2.0 * pi()) * y) / 512.0) - exp(-(pi() - ((2.0 * pi()) * y) / 512.0)))) AS tmaxy, " +
      "(180.0 / pi()) * atan(0.5 * (exp(pi() - ((2.0 * pi()) * (y + 1)) / 512.0) - exp(-(pi() - ((2.0 * pi()) * (y + 1)) / 512.0)))) AS tminy FROM t) " +
      "SELECT pid, CAST(trunc(((lon - tminx) / (tmaxx - tminx)) * 4096.0) AS DOUBLE) AS px, " +
      "CAST(trunc(((tmaxy - lat) / (tmaxy - tminy)) * 4096.0) AS DOUBLE) AS py FROM e"),

    "q31_geojson_roundtrip" ->
      s"WITH $P SELECT pid, lon AS x, lat AS y FROM pts",

    // UTM forward series (WGS84) mirrored operation-for-operation from
    // graft.core.Utm.fromLngLat — every subexpression parenthesized to
    // force the identical IEEE evaluation order
    "q32_utm" ->
      (s"WITH $P, f AS (SELECT pid, lon, lat FROM pts WHERE lat >= -80 AND lat <= 84), " +
      "z AS (SELECT pid, lon, lat, " +
      "CASE WHEN lat >= 56 AND lat < 64 AND lon >= 3 AND lon < 12 THEN 32 " +
      "WHEN lat >= 72 AND lat < 84 AND lon >= 0 AND lon < 9 THEN 31 " +
      "WHEN lat >= 72 AND lat < 84 AND lon >= 9 AND lon < 21 THEN 33 " +
      "WHEN lat >= 72 AND lat < 84 AND lon >= 21 AND lon < 33 THEN 35 " +
      "WHEN lat >= 72 AND lat < 84 AND lon >= 33 AND lon < 42 THEN 37 " +
      "ELSE CAST(trunc((lon + 180) / 6) AS INTEGER) + 1 END AS zn, " +
      "substr('CDEFGHJKLMNPQRSTUVWX', least(CAST(trunc((lat + 80) / 8) AS INTEGER), 19) + 1, 1) AS zl FROM f), " +
      "g AS (SELECT pid, lon, lat, zn, zl, ((lat) * pi()) / 180 AS latrad, ((lon) * pi()) / 180 AS lngrad, " +
      "((CAST((zn - 1) * 6 - 180 + 3 AS DOUBLE)) * pi()) / 180 AS lngoriginrad, " +
      "0.00669438 / (1 - 0.00669438) AS ep, sin(((lat) * pi()) / 180) AS sl, cos(((lat) * pi()) / 180) AS cl, " +
      "CASE WHEN ((lat) * pi()) / 180 <> 0.0 THEN tan(((lat) * pi()) / 180) ELSE 0.0 END AS t0, " +
      "0.00669438 * 0.00669438 AS e2 FROM z), " +
      "h AS (SELECT *, 6378137.0 / sqrt(1 - ((0.00669438 * sl) * sl)) AS n, t0 * t0 AS t, " +
      "((ep * ep) * cl) * cl AS c, (lngrad - lngoriginrad) * cl AS a, e2 * 0.00669438 AS e3 FROM g), " +
      "i AS (SELECT *, (t * t) AS t2, ((t * t) * t) AS t3, (c * c) AS c2, (a * a) AS a2, ((a * a) * a) AS a3, " +
      "(((a * a) * a) * a) AS a4, ((((a * a) * a) * a) * a) AS a5, (((((a * a) * a) * a) * a) * a) AS a6 FROM h), " +
      "j AS (SELECT *, " +
      "(((1 - (0.00669438 / 4.0)) - ((3.0 / 64.0) * e2)) - ((5.0 / 256.0) * e3)) * latrad AS m01, " +
      "((((3.0 / 8.0) * 0.00669438) + ((3.0 / 32.0) * e2)) + ((45.0 / 1024.0) * e3)) * sin(latrad * 2.0) AS m02, " +
      "(((15.0 / 256.0) * e2) + ((45.0 / 1024.0) * e3)) * sin(latrad * 4.0) AS m03, " +
      "((35.0 / 3072.0) * e3) * sin(latrad * 6.0) AS m04 FROM i), " +
      "k AS (SELECT *, 6378137.0 * (((m01 - m02) + m03) - m04) AS m FROM j), " +
      "l AS (SELECT pid, lat, zn, zl, " +
      "((0.9996 * n) * ((a + ((((1.0 - t) + c) * a3) / 6.0)) + (((((5.0 - (10.0 * t3)) + (72.0 * c)) - (58.0 * ep)) * a5) / 120.0))) + 500000.0 AS easting, " +
      "0.9996 * (m + ((n * t0) * (((a2 / 2.0) + (((((5.0 - t) + (9.0 * c)) + (4.0 * c2)) * a4) / 24.0)) + ((((((61.0 - (58.0 * t)) + t2) + (600.0 * c)) - (330.0 * ep)) * a6) / 720.0)))) AS nb FROM k) " +
      "SELECT pid, round(CASE WHEN lat < 0.0 THEN nb + 10000000.0 ELSE nb END, 3) AS northing, round(easting, 3) AS easting, zn, zl FROM l"),

    // Utm.toLngLat mirrored op-for-op (incl. the d6*720 quirk); inputs are
    // the same pid-derived synthetic UTM coordinates as the Spark side.
    "q38_utm_inverse" ->
      (s"WITH $P, b AS (SELECT pid, CAST(pid % 60 + 1 AS INTEGER) AS zn, " +
      "substr('CDEFGHJKLMNPQRSTUVWX', CAST(pid % 20 AS INTEGER) + 1, 1) AS zl, " +
      "2000000.0 + CAST(pid % 740 AS DOUBLE) * 10000.0 + CAST(pid % 1000 AS DOUBLE) * 7.13 AS northing, " +
      "100000.0 + CAST(pid % 797 AS DOUBLE) * 1000.0 + CAST(pid % 13 AS DOUBLE) * 7.3 AS easting FROM pts), " +
      "c AS (SELECT *, easting - 500000.0 AS x, " +
      "CASE WHEN zl >= 'N' THEN northing ELSE northing - 10000000.0 END AS y, " +
      "CAST((zn - 1) * 6 - 180 + 3 AS DOUBLE) AS lngorigin, " +
      "0.00669438 * 0.00669438 AS e2, (0.00669438 * 0.00669438) * 0.00669438 AS e3, " +
      "0.00669438 / (1.0 - 0.00669438) AS ep FROM b), " +
      "d AS (SELECT *, (y / 0.9996) / (6378137.0 * (((1.0 - (0.00669438 / 4.0)) - ((3.0 / 64.0) * e2)) - ((5.0 / 256.0) * e3))) AS mu, " +
      "(1.0 - sqrt(1.0 - 0.00669438)) / (1.0 + sqrt(1.0 - 0.00669438)) AS e1 FROM c), " +
      "f AS (SELECT *, e1 * e1 AS e12, (e1 * e1) * e1 AS e13, ((e1 * e1) * e1) * e1 AS e14 FROM d), " +
      "g AS (SELECT *, ((mu + ((((3.0 / 2.0) * e1) - ((27.0 / 32.0) * e13)) * sin(mu * 2.0))) + ((((21.0 / 16.0) * e12) - ((55.0 / 32.0) * e14)) * sin(mu * 4.0))) + (((151.0 / 96.0) * e13) * sin(mu * 6.0)) AS phi1 FROM f), " +
      "h AS (SELECT *, tan(phi1) AS pt1, sin(phi1) AS ps1, cos(phi1) AS pc1 FROM g), " +
      "i AS (SELECT *, 1.0 - ((0.00669438 * ps1) * ps1) AS aa FROM h), " +
      "j AS (SELECT *, 6378137.0 / sqrt(aa) AS n1, pt1 * pt1 AS t1, (pt1 * pt1) * (pt1 * pt1) AS t12, (0.00669438 * pc1) * pc1 AS c1 FROM i), " +
      "k AS (SELECT *, c1 * c1 AS c12, 3.0 * (c1 * c1) AS c12_3, (6378137.0 * (1.0 - 0.00669438)) / power(aa, 1.5) AS r1, x / (n1 * 0.9996) AS dd FROM j), " +
      "l AS (SELECT *, dd * dd AS d2, (dd * dd) * dd AS d3, ((dd * dd) * dd) * dd AS d4, (((dd * dd) * dd) * dd) * dd AS d5, ((((dd * dd) * dd) * dd) * dd) * dd AS d6 FROM k), " +
      "m AS (SELECT *, phi1 - (((n1 * pt1) / r1) * (((d2 / 2.0) - ((((((5.0 + (3.0 * t1)) + (10.0 * c1)) - (4.0 * c12)) - (9.0 * ep)) * d4) / 24.0)) + ((((((((61.0 + (90.0 * t1)) + (298.0 * c1)) + (45.0 * t12)) - (252.0 * ep)) - c12_3)) * d6) * 720.0))) AS latrad, " +
      "((dd - ((((1.0 + (2.0 * t1)) + c1) * d3) / 6.0)) + ((((((((5.0 - (2.0 * c1)) + (28.0 * t1)) - c12_3) + (8.0 * ep)) + (24.0 * t12))) * d5) / 120.0)) / pc1 AS lngrad FROM l) " +
      "SELECT pid, round(lngorigin + ((lngrad * 180.0) / pi()), 9) AS lng, round((latrad * 180.0) / pi(), 9) AS lat FROM m"),

    "q39_embed_neardup" -> {
      val dotQ = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), " +
        "i -> a.v[CAST(i AS INTEGER)] * b2.v[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
      def nrm(t: String) = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), " +
        s"i -> $t.v[CAST(i AS INTEGER)] * $t.v[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"
      ("WITH e AS (SELECT vec_id AS vid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
      "p0 AS (SELECT vid AS ovid, v FROM e WHERE vid % 10 = 0), " +
      "p AS (SELECT ovid + 1000000 AS vid, list_transform(range(1, 65), " +
      "i -> v[CAST(i AS INTEGER)] * (CAST(1.0 AS DOUBLE) + CAST(((ovid + (i - 1)) % 7) - 3 AS DOUBLE) * CAST(0.0001 AS DOUBLE))) AS v FROM p0), " +
      "c AS (SELECT * FROM e UNION ALL SELECT * FROM p), " +
      s"b AS (SELECT vid, v, ${graft.operators.Ann.bucketSql("v", 64, 8)} AS bucket FROM c), " +
      "pr AS (SELECT a.vid AS vid_a, b2.vid AS vid_b, " +
      s"$dotQ / (sqrt(${nrm("a")}) * sqrt(${nrm("b2")})) AS cos " +
      "FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vid < b2.vid) " +
      "SELECT vid_a, vid_b, cos FROM pr WHERE cos >= 0.99")
    },

    // the oracle RE-RUNS THE ENTIRE FIT in SQL (deterministic sample,
    // 5 fixed k-means iterations as unrolled CTEs) — the centroids are
    // data, not constants, so the oracle derives them from the same table
    "q40_ann_ivf" ->
      graft.operators.IvfLearned.oracleSql(dim = 64, iters = 5,
        maxCentroids = 64, k = 5, nProbe = 3, queryMod = 40),

    "q41_rasterize" ->
      (s"WITH $P, t AS (SELECT ${Synth.lon2TileSql("lon", 9)} AS x, ${Synth.lat2TileSql("lat", 9)} AS y, " +
      s"${Synth.lon2TileSql("lon", 17)} AS fx, ${Synth.lat2TileSql("lat", 17)} AS fy FROM pts) " +
      "SELECT x, y, fy - y * 256 AS py, fx - x * 256 AS px, count(*) AS n FROM t GROUP BY 1, 2, 3, 4"),

    "q42_raster_runs" ->
      (s"WITH $P, t AS (SELECT ${Synth.lon2TileSql("lon", 5)} AS x, ${Synth.lat2TileSql("lat", 5)} AS y, " +
      s"${Synth.lon2TileSql("lon", 11)} AS fx, ${Synth.lat2TileSql("lat", 11)} AS fy FROM pts), " +
      "r AS (SELECT x, y, fy - y * 64 AS py, fx - x * 64 AS px, count(*) AS n FROM t GROUP BY 1, 2, 3, 4), " +
      "i AS (SELECT x, y, py, px, n, px - row_number() OVER (PARTITION BY x, y, py ORDER BY px ASC) AS isl FROM r) " +
      "SELECT x, y, py, min(px) AS px0, max(px) AS px1, CAST(sum(n) AS BIGINT) AS n_pts FROM i GROUP BY x, y, py, isl"),

    // replays Media.synthPixel + the 4×4-grid means directly in SQL; the
    // engine side must round-trip the same values through REAL PNG bytes
    // and the REAL javax.imageio decoder (16×16 px, 4-px cells, means are
    // integer-sum/16 — exact in both engines)
    "q48_image_decode" ->
      ("WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0), " +
      "px AS (SELECT doc_id, xs.x AS x, ys.y AS y FROM ids " +
      "CROSS JOIN (SELECT unnest(range(16)) AS x) xs " +
      "CROSS JOIN (SELECT unnest(range(16)) AS y) ys) " +
      "SELECT doc_id AS media_id, CAST(x // 4 AS INTEGER) AS cell_x, " +
      "CAST(y // 4 AS INTEGER) AS cell_y, " +
      "avg((doc_id * 7 + x * 13 + y * 17) % 256) AS mean_r, " +
      "avg((doc_id * 11 + x * 3 + y * 29) % 256) AS mean_g, " +
      "avg((doc_id * 5 + x * 23 + y * 7) % 256) AS mean_b " +
      "FROM px GROUP BY 1, 2, 3"),

    // q03's oracle verbatim: the big-big shuffle plan must be
    // result-identical to the broadcast plan (box polygons make PIP an
    // exact bbox test in SQL)
    "q53_pip_join_bigbig" ->
      s"WITH $P, $R SELECT pid, region_id FROM pts, regions WHERE lon >= minx AND lon <= maxx AND lat >= miny AND lat <= maxy",

    // planar degree metric, squared compare (no sqrt on either side);
    // the BETWEEN prefilter lets DuckDB run its inequality join instead
    // of a blind cross product
    "q54_distance_join" ->
      (s"WITH $P SELECT a.pid AS qid, b.pid AS nid FROM pts a, pts b " +
      "WHERE a.pid % 4 = 0 AND a.pid <> b.pid " +
      "AND b.lon BETWEEN a.lon - 1.0 AND a.lon + 1.0 " +
      "AND b.lat BETWEEN a.lat - 1.0 AND a.lat + 1.0 " +
      "AND ((a.lon - b.lon) * (a.lon - b.lon) + (a.lat - b.lat) * (a.lat - b.lat)) <= 1.0"),

    // closed-interval bbox overlap: 2°×2° point boxes × region bboxes
    "q55_extent_join" ->
      (s"WITH $P, $R SELECT a.pid, r.region_id FROM pts a, regions r " +
      "WHERE a.pid % 16 = 0 " +
      "AND a.lon <= r.maxx AND r.minx <= a.lon + 2.0 " +
      "AND a.lat <= r.maxy AND r.miny <= a.lat + 2.0"),

    // rational-idf tf-idf: integer counts + one correctly-rounded double
    // multiply/divide each, so `score` matches Spark bit-for-bit
    "q56_tfidf_terms" ->
      ("WITH w AS (SELECT doc_id AS doc, unnest(list_filter(" +
      "regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS word FROM documents), " +
      "tf AS (SELECT doc, word, count(*) AS tf FROM w GROUP BY 1, 2), " +
      "df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1), " +
      "n AS (SELECT count(*) AS n FROM documents), " +
      "s AS (SELECT tf.doc, tf.word, tf.tf, df.df, " +
      "(tf.tf * (n.n + 1.0)) / (df.df + 1.0) AS score FROM tf, df, n WHERE tf.word = df.word), " +
      "r AS (SELECT *, row_number() OVER (PARTITION BY doc ORDER BY score DESC, word) AS rk FROM s) " +
      "SELECT doc, word, tf, df, score, rk FROM r WHERE rk <= 5"),

    // percentile_disc semantics spelled out as rank arithmetic so both
    // engines run the IDENTICAL definition: rank ⌈q·n⌉ in INTEGER form
    // (qn = q·10⁶; (qn·n + 10⁶−1) // 10⁶) — float ceil(q*n) is off by one
    // exactly when q·n is an integer the product rounds up (0.01·300)
    "q57_quantiles" ->
      ("WITH c AS (SELECT source, n_chars, doc_id, " +
      "row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn, " +
      "count(*) OVER (PARTITION BY source) AS n FROM documents), " +
      "q AS (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS q, " +
      "unnest([250000, 500000, 750000, 950000]) AS qn) " +
      "SELECT c.source, q.q, c.n_chars AS value FROM c, q " +
      "WHERE c.rn = greatest(1, (q.qn * c.n + 999999) // 1000000)"),

    // MINSTD keep-set: all arithmetic below 2^63 in both engines; the id
    // is reduced with a sign-safe pmod (negative ids hash like Spark's)
    "q58_hash_sample" ->
      ("SELECT doc_id, source, n_chars FROM documents " +
      "WHERE ((doc_id % 2147483647 + 2147483647) % 2147483647) * 48271 % 2147483647 % 1000 < 250"),

    // multiply-before-divide + round-half-away pinned on both sides
    "q59_quantize_int8" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
      "m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e) " +
      "SELECT vec_id, CAST(j AS INTEGER) AS idx, " +
      "CASE WHEN mx = 0 THEN 0 ELSE CAST(round((v[CAST(j AS INTEGER) + 1] * 127.0) / mx) AS INTEGER) END AS qv, mx " +
      "FROM m CROSS JOIN (SELECT unnest(range(64)) AS j) t"),

    // the q48 pixel-function replay at the resize's source coordinates
    // (dst (x,y) <- src (2x, 2y) for 16->8 by integer floor division)
    "q60_image_resize" ->
      ("WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0), " +
      "px AS (SELECT doc_id, xs.x AS x, ys.y AS y FROM ids " +
      "CROSS JOIN (SELECT unnest(range(8)) AS x) xs " +
      "CROSS JOIN (SELECT unnest(range(8)) AS y) ys) " +
      "SELECT doc_id AS media_id, CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y, " +
      "CAST((doc_id * 7 + (2 * x) * 13 + (2 * y) * 17) % 256 AS INTEGER) AS r, " +
      "CAST((doc_id * 11 + (2 * x) * 3 + (2 * y) * 29) % 256 AS INTEGER) AS g, " +
      "CAST((doc_id * 5 + (2 * x) * 23 + (2 * y) * 7) % 256 AS INTEGER) AS b " +
      "FROM px"),

    // explicit LATERAL replay of the as-of tie rules: latest rts <= ts,
    // ties by largest view_id
    "q61_asof_join" ->
      ("WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'), " +
      "r AS (SELECT user_id, ts AS rts, event_id AS view_id, value AS view_value " +
      "FROM events WHERE event_type = 'view') " +
      "SELECT l.event_id, l.user_id, m.view_id, m.view_value FROM l, LATERAL (" +
      "SELECT view_id, view_value FROM r " +
      "WHERE r.user_id = l.user_id AND r.rts <= l.ts " +
      "ORDER BY r.rts DESC, view_id DESC LIMIT 1) m"),

    // the lookback rule replayed as LEFT LATERAL with the horizon in the
    // predicate: latest-overall-then-null and latest-in-horizon agree
    // because the latest match is in-horizon iff any match is
    "q62_asof_lookback" ->
      ("WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'), " +
      "r AS (SELECT user_id, ts AS rts, event_id AS view_id, value AS view_value " +
      "FROM events WHERE event_type = 'view') " +
      "SELECT l.event_id, l.user_id, m.view_id, m.view_value FROM l LEFT JOIN LATERAL (" +
      "SELECT view_id, view_value FROM r " +
      "WHERE r.user_id = l.user_id AND r.rts <= l.ts " +
      "AND epoch_us(l.ts) - epoch_us(r.rts) <= 86400000000 " +
      "ORDER BY r.rts DESC, view_id DESC LIMIT 1) m ON TRUE"),

    // LCC 2SP (EPSG:2263) forward, constants and per-row math in the same
    // expression shapes as core/Proj.scala (EPSG GN7-2 method 9802); the
    // 1e-3 ftUS rounding absorbs cross-libm transcendental ULPs (q32
    // pattern). tsfn(φ) = tan(0.5(π/2−φ)) / ((1−e·sinφ)/(1+e·sinφ))^(e/2).
    "q63_project_lcc" ->
      (s"WITH $P, " +
      "c0 AS (SELECT 1.0/298.257222101 AS f, 6378137.0/(1200.0/3937.0) AS a_u, " +
      "(40.0 + 40.0/60.0) * pi() / 180.0 AS phi1, (41.0 + 2.0/60.0) * pi() / 180.0 AS phi2, " +
      "(40.0 + 10.0/60.0) * pi() / 180.0 AS phi0, -74.0 * pi() / 180.0 AS lam0), " +
      "c1 AS (SELECT *, f*(2.0-f) AS es, sqrt(f*(2.0-f)) AS e FROM c0), " +
      "c2 AS (SELECT *, " +
      "cos(phi1)/sqrt(1.0 - es*sin(phi1)*sin(phi1)) AS m1, " +
      "cos(phi2)/sqrt(1.0 - es*sin(phi2)*sin(phi2)) AS m2, " +
      "tan(0.5*(pi()/2.0 - phi1))/pow((1.0 - e*sin(phi1))/(1.0 + e*sin(phi1)), 0.5*e) AS t1, " +
      "tan(0.5*(pi()/2.0 - phi2))/pow((1.0 - e*sin(phi2))/(1.0 + e*sin(phi2)), 0.5*e) AS t2, " +
      "tan(0.5*(pi()/2.0 - phi0))/pow((1.0 - e*sin(phi0))/(1.0 + e*sin(phi0)), 0.5*e) AS t0 " +
      "FROM c1), " +
      "c3 AS (SELECT *, (ln(m1) - ln(m2))/(ln(t1) - ln(t2)) AS n FROM c2), " +
      "c4 AS (SELECT *, m1/(n*pow(t1, n)) AS bigf FROM c3), " +
      "c AS (SELECT *, a_u*bigf*pow(t0, n) AS r0 FROM c4), " +
      "g AS (SELECT pid, lat * pi() / 180.0 AS phi, lon * pi() / 180.0 AS lam FROM pts), " +
      "h AS (SELECT pid, a_u*bigf*pow(" +
      "tan(0.5*(pi()/2.0 - phi))/pow((1.0 - e*sin(phi))/(1.0 + e*sin(phi)), 0.5*e), n) AS r, " +
      "n*(lam - lam0) AS theta, r0 FROM g, c) " +
      "SELECT pid, round(984250.0 + r*sin(theta), 3) AS easting_ft, " +
      "round(r0 - r*cos(theta), 3) AS northing_ft FROM h"),

    // concat-and-chunk packing: int64-only arithmetic, same MINSTD shard
    // recurrence as q58; SUM window cast back to BIGINT (DuckDB widens to
    // HUGEINT)
    "q64_seq_pack" ->
      ("WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS len, " +
      "(doc_id % 2147483647) * 48271 % 2147483647 % 8 AS shard FROM documents), " +
      "w AS (SELECT doc_id, shard, len, CAST(SUM(len) OVER (PARTITION BY shard " +
      "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_end FROM d) " +
      "SELECT doc_id, shard, (cum_end - len) // 2048 AS bin, " +
      "(cum_end - len) % 2048 AS bin_offset, " +
      "((cum_end - len) % 2048 + len > 2048) AS straddles FROM w"),

    // mixture resample to 4:3:2:1 (den = 10): T = min over domains of
    // cnt*den//w, keep_n = w*T//den, keep the keep_n smallest MINSTD id
    // hashes per domain — all integer, bit-exact
    "q65_mixture" ->
      ("WITH d AS (SELECT doc_id, source FROM documents " +
      "WHERE source IN ('src0','src1','src2','src3')), " +
      "wt AS (SELECT * FROM (VALUES ('src0', CAST(4 AS BIGINT)), ('src1', CAST(3 AS BIGINT)), " +
      "('src2', CAST(2 AS BIGINT)), ('src3', CAST(1 AS BIGINT))) AS t(source, w)), " +
      "cnt AS (SELECT source, COUNT(*) AS cnt FROM d GROUP BY source), " +
      "caps0 AS (SELECT cnt.source, (cnt.cnt * 10) // wt.w AS t_cap, wt.w " +
      "FROM cnt JOIN wt USING (source)), " +
      "caps AS (SELECT source, CAST((w * (SELECT MIN(t_cap) FROM caps0)) // 10 AS BIGINT) AS keep_n " +
      "FROM caps0), " +
      "r AS (SELECT d.doc_id, d.source, caps.keep_n, ROW_NUMBER() OVER (" +
      "PARTITION BY d.source ORDER BY (d.doc_id % 2147483647) * 48271 % 2147483647, d.doc_id) AS rk " +
      "FROM d JOIN caps USING (source)) " +
      "SELECT doc_id, source, keep_n FROM r WHERE rk <= keep_n"),

    // vertex-order-preserving dump of the reprojected geometries; the
    // spherical-Mercator forward in the exact core/Slippy.scala op shapes
    // (x = R·(lon·π/180), y = R·ln(tan(π/4 + (lat·π/180)/2))), mm-rounded
    "q66_transform_geom" ->
      (s"WITH $P, v AS (" +
      "SELECT pid, 0 AS idx, lon AS vx, lat AS vy FROM pts WHERE pid % 2 = 0 " +
      "UNION ALL SELECT pid, 1, lon2, lat2 FROM pts WHERE pid % 2 = 0 " +
      "UNION ALL SELECT pid, 2, (lon + lon2) / 2, (lat + lat2) / 2 FROM pts WHERE pid % 2 = 0 " +
      "UNION ALL SELECT pid, 0, lon, lat FROM pts WHERE pid % 2 <> 0 " +
      "UNION ALL SELECT pid, 1, lon2, lat2 FROM pts WHERE pid % 2 <> 0 " +
      "UNION ALL SELECT pid, 2, lon, lat2 FROM pts WHERE pid % 2 <> 0 " +
      "UNION ALL SELECT pid, 3, lon2, lat FROM pts WHERE pid % 2 <> 0) " +
      "SELECT pid, CAST(idx AS BIGINT) AS idx, " +
      "round(6378137.0 * (vx * pi() / 180.0), 3) AS mx, " +
      "round(6378137.0 * ln(tan(pi() / 4.0 + (vy * pi() / 180.0) / 2.0)), 3) AS my FROM v")
      ,

    // the pinned repetition definitions replayed: one tagged unit pool
    // (words / 2-grams / 3-grams with space joiners), per-(doc,kind,unit)
    // counts, the (cnt, gram)-max tie rule, int64→double fraction divides
    "q67_repetition" ->
      ("WITH w AS (SELECT doc_id AS doc, list_filter(" +
      "regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws FROM documents), " +
      "u AS (SELECT doc, 'w' AS kind, unnest(ws) AS unit FROM w " +
      "UNION ALL SELECT doc, 'g2', unnest(list_transform(range(1, len(ws)), " +
      "i -> ws[i] || ' ' || ws[i+1])) FROM w " +
      "UNION ALL SELECT doc, 'g3', unnest(list_transform(range(1, len(ws) - 1), " +
      "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) FROM w), " +
      "c AS (SELECT doc, kind, unit, count(*) AS cnt, CAST(length(unit) AS BIGINT) AS chars " +
      "FROM u GROUP BY 1, 2, 3), " +
      "t2 AS (SELECT doc, cnt, unit FROM (SELECT doc, cnt, unit, row_number() OVER (" +
      "PARTITION BY doc ORDER BY cnt DESC, unit DESC) AS rk FROM c WHERE kind = 'g2') WHERE rk = 1), " +
      "a AS (SELECT doc, CAST(sum(CASE WHEN kind = 'w' THEN cnt END) AS BIGINT) AS n_tokens, " +
      "CAST(count(CASE WHEN kind = 'w' THEN 1 END) AS BIGINT) AS n_types, " +
      "CAST(sum(CASE WHEN kind = 'g2' THEN cnt * chars END) AS BIGINT) AS chars2, " +
      "CAST(coalesce(sum(CASE WHEN kind = 'g3' AND cnt > 1 THEN cnt * chars END), 0) AS BIGINT) AS dup3_chars, " +
      "CAST(sum(CASE WHEN kind = 'g3' THEN cnt * chars END) AS BIGINT) AS chars3 " +
      "FROM c GROUP BY 1) " +
      "SELECT d.doc_id AS doc, coalesce(n_tokens, 0) AS n_tokens, coalesce(n_types, 0) AS n_types, " +
      "CASE WHEN coalesce(n_tokens, 0) > 0 THEN CAST(n_tokens - n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) END AS dup_word_frac, " +
      "CASE WHEN chars2 > 0 THEN CAST(t2.cnt * length(t2.unit) AS DOUBLE) / CAST(chars2 AS DOUBLE) END AS top2_frac, " +
      "CASE WHEN chars3 > 0 THEN CAST(dup3_chars AS DOUBLE) / CAST(chars3 AS DOUBLE) END AS dup3_frac " +
      "FROM documents d LEFT JOIN a ON d.doc_id = a.doc LEFT JOIN t2 ON d.doc_id = t2.doc"),

    // same injected PII, same pass order: emails on the raw text, IPs on
    // the email-redacted text (both patterns are in the RE2∩Java subset)
    "q68_redact_pii" ->
      ("WITH a AS (SELECT doc_id, substr(text, 1, 40) || ' mail user' || " +
      "CAST(doc_id % 97 AS VARCHAR) || '@ex' || CAST(doc_id % 7 AS VARCHAR) || " +
      "'.com ip 10.' || CAST(doc_id % 251 AS VARCHAR) || '.0.' || " +
      "CAST(doc_id % 250 AS VARCHAR) || ' tail' AS t FROM documents), " +
      "e AS (SELECT doc_id, CAST(len(regexp_extract_all(t, " +
      "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email, " +
      "regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t2 FROM a) " +
      "SELECT doc_id, n_email, CAST(len(regexp_extract_all(t2, " +
      "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ip, " +
      "regexp_replace(t2, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS redacted FROM e"),

    // rk·den ≤ n·cum integer thresholds, MINSTD rank order, 8:1:1
    "q69_strat_split" ->
      ("WITH d AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source " +
      "ORDER BY (doc_id % 2147483647) * 48271 % 2147483647, doc_id) AS rk, " +
      "count(*) OVER (PARTITION BY source) AS n FROM documents) " +
      "SELECT doc_id, source, CASE WHEN rk * 10 <= n * 8 THEN 'train' " +
      "WHEN rk * 10 <= n * 9 THEN 'val' ELSE 'test' END AS split FROM d"),

    // identical containment semantics to q03 — only the physical layout
    // differs (bucketed tables, exchange-free merge join)
    "q70_bucketed_pip" ->
      s"WITH $P, $R SELECT pid, region_id FROM pts, regions WHERE lon >= minx AND lon <= maxx AND lat >= miny AND lat <= maxy",

    // the Morton interleave replayed step-for-step in int64 (the magic
    // masks in decimal); the grid step is the identical pinned float expr
    "q71_morton_key" ->
      (s"WITH $P, g AS (SELECT pid, " +
      "least(65535, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 65536.0) AS BIGINT))) AS gx, " +
      "least(65535, greatest(0, CAST(floor((lat + 90.0) / 180.0 * 65536.0) AS BIGINT))) AS gy FROM pts), " +
      "s1 AS (SELECT pid, (gx | (gx << 8)) & 71777214294589695 AS px, (gy | (gy << 8)) & 71777214294589695 AS py FROM g), " +
      "s2 AS (SELECT pid, (px | (px << 4)) & 1085102592571150095 AS qx, (py | (py << 4)) & 1085102592571150095 AS qy FROM s1), " +
      "s3 AS (SELECT pid, (qx | (qx << 2)) & 3689348814741910323 AS rx, (qy | (qy << 2)) & 3689348814741910323 AS ry FROM s2), " +
      "s4 AS (SELECT pid, (rx | (rx << 1)) & 6148914691236517205 AS sx, (ry | (ry << 1)) & 6148914691236517205 AS sy FROM s3) " +
      "SELECT pid, sx | (sy << 1) AS zkey FROM s4")
  )
}
