package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-parallelism scaling evidence (BASELINE.md measurement plan): the
  * same headline jobs on the same input at local[8] and local[32],
  * reporting throughput at both plus scaling efficiency
  * = (throughput_32 / throughput_8) / (32 / 8).
  *
  * Round-1 lesson (VERDICT.md): sub-10 s jobs measure per-job fixed
  * overhead, not throughput — each headline query needs an input sized so
  * its local[8] runtime is tens of seconds. Round-2 lesson: the operators
  * got faster (kNN rework: 46.6 s → 8.1 s on the ×8 replica at local[8]),
  * so the tiers must grow with them. Each query is therefore pinned to a
  * replica tier sized for its post-rework throughput:
  *
  *   ×8   — q33 (five geometry kernels per row: the composed tile pipeline)
  *   ×48  — q21/q12 (the points shuffle dominates: the honest cell-join
  *           shape), q29 (makevalid kernel, allocation-heavy)
  *   ×480 — q01/q03/q30 (map-only tile math: µs/row, needs 288M rows to
  *           spend tens of seconds at 8 cores)
  *
  * One fixed input per query across both parallelism levels (the north
  * rule's N-vs-4N criterion); runs are interleaved two rounds per
  * parallelism and the per-query minimum taken, damping sandbox CPU noise.
  */
object Scaling {

  /** query → replica factor. q33_pipeline_op reads the PREBUILT WKB
    * geometry parquet (written at prepare time) so the measurement covers
    * the tile-pipeline OPERATOR, not the synthetic per-row WKT string
    * construction that exists only to make the gate oracle-expressible
    * (double→string formatting allocates more than the geometry kernels
    * themselves and was dominating the measured "pipeline" scaling).
    */
  private val plan: Seq[(String, Int)] = Seq(
    "q33_pipeline_op" -> 8,
    "q21_knn_cell" -> 48,
    "q12_knn" -> 48,
    "q29_makevalid" -> 48,
    "q01_tile_assign" -> 480,
    "q03_pip_join" -> 480,
    "q30_mvt_prepare" -> 480)

  private def dirFor(factor: Int) = s"/tmp/graft_scaled$factor"

  def prepareScaled(sfDir: String, factor: Int): Unit = {
    val outDir = dirFor(factor)
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(outDir, "_READY"))) return
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val replicated = (0 until factor).map { i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 1000000000L))
    }.reduce(_ unionByName _)
    replicated.repartition(32).write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    for (t <- Seq("nation", "documents", "events", "embeddings", "orders", "customer"))
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    if (factor == 8) // the tile-pipeline tier reads prebuilt WKB geometry
      SparkEntry.q33Input(spark, outDir)
        .write.mode("overwrite").parquet(s"$outDir/q33geom.parquet")
    spark.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    java.nio.file.Files.write(java.nio.file.Paths.get(outDir, "_READY"), Array.emptyByteArray)
  }

  /** scaling-only measurement queries (not part of the driver gate). */
  private val localQueries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "q33_pipeline_op" -> ((s, dir) => {
      val pre = new java.io.File(s"$dir/q33geom.parquet")
      // warm-up dirs have no prebuilt file — build the input inline there
      val in = if (pre.exists) s.read.parquet(pre.getPath)
               else SparkEntry.q33Input(s, dir)
      graft.operators.TilePipeline.mvtCommands(in, "geom", "z9", "tx", "ty")
        .select(col("pid"), col("mvt_type"),
          size(col("mvt_commands")).cast("long").as("n_cmds"))
    }))

  /** One session at `cpus`: warm up on sf0.001, then run each query on its
    * size-matched replica dir.
    *
    * Two masters:
    *  - default: `local[cpus]` (single shared JVM — thread scaling);
    *  - SPARK_GRAFT_EXEC_MODE=cluster: `local-cluster[cpus/4, 4, mem]` —
    *    REAL SEPARATE EXECUTOR JVMs (Spark standalone in-process), i.e.
    *    the north rule's "N vs 4N executors" literally: 8 cores = 2
    *    executors, 32 cores = 8 executors, each with its own heap and GC.
    *    A single shared JVM understates scaling for allocation-heavy
    *    kernels (all 32 threads fight one allocator); separate executor
    *    JVMs are what a real cluster runs. Requires `sbt package` first
    *    (the app jar ships to executors via spark.jars) and a writable
    *    SPARK_HOME (jars symlink) so worker scratch stays out of /opt.
    */
  def runAt(cpus: Int): Map[String, Double] = {
    val clusterMode = sys.env.get("SPARK_GRAFT_EXEC_MODE").contains("cluster")
    // CONSTANT shuffle partitioning across both parallelism levels: with
    // partitions = cores, the low-core side gets 4-8× larger partitions
    // and its window sorts start spilling — the high-core side then looks
    // superlinear (measured q21 "efficiency" 1.76 at 4→16). 64 partitions
    // keep every level's partitions spill-free and identical on both sides,
    // so the ratio measures parallelism, nothing else.
    val builder0 = SparkSession.builder()
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    val builder =
      if (clusterMode) {
        val execCores = 4
        val nExec = math.max(1, cpus / execCores)
        val jar = new java.io.File("target/scala-2.13/geomspark_2.13-0.1.0.jar")
        require(jar.exists, "cluster mode needs `sbt package` first")
        val addOpens = Seq(
          "java.base/java.lang", "java.base/java.lang.invoke",
          "java.base/java.lang.reflect", "java.base/java.io",
          "java.base/java.net", "java.base/java.nio",
          "java.base/java.util", "java.base/java.util.concurrent",
          "java.base/java.util.concurrent.atomic",
          "java.base/sun.nio.ch", "java.base/sun.nio.cs",
          "java.base/sun.security.action", "java.base/sun.util.calendar")
          .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
        builder0
          .master(s"local-cluster[$nExec,$execCores,7168]")
          .config("spark.jars", jar.getAbsolutePath)
          .config("spark.executor.memory", "6g")
          .config("spark.executor.extraJavaOptions", addOpens)
      } else builder0.master(s"local[$cpus]")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries ++ localQueries
    val names = activePlan.map(_._1).toSet
    Bench.run(spark, "/root/testdata/sf0.001",
      qs.view.filterKeys(names.contains).toMap) // warm-up
    val out = activePlan.map { case (name, factor) =>
      val t = Bench.run(spark, dirFor(factor), Map(name -> qs(name)))
      name -> t(name)
    }.toMap
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    out
  }

  /** optional comma-separated query filter (experiments): SPARK_GRAFT_SCALE_ONLY */
  private def activePlan: Seq[(String, Int)] =
    sys.env.get("SPARK_GRAFT_SCALE_ONLY") match {
      case Some(names) =>
        val keep = names.split(",").map(_.trim).toSet
        plan.filter { case (q, _) => keep.contains(q) }
      case None => plan
    }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    activePlan.map(_._2).distinct.foreach(f => prepareScaled(base, f))

    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    // interleaved rounds, per-query minimum; `once` = single round (for
    // retry loops gated on a host-contention probe — the sandbox host
    // intermittently caps deliverable cores, which bounds any measurable
    // efficiency regardless of plan quality)
    val once = args.contains("once")
    val r1a = runAt(lo)
    val r1b = runAt(hi)
    val r2a = if (once) r1a else runAt(lo)
    val r2b = if (once) r1b else runAt(hi)
    val perLo = r1a.map { case (k, v) => k -> math.min(v, r2a(k)) }
    val perHi = r1b.map { case (k, v) => k -> math.min(v, r2b(k)) }
    val tLo = perLo.values.sum
    val tHi = perHi.values.sum
    val speedup = tLo / tHi
    val eff = speedup / (hi.toDouble / lo.toDouble)
    val perQueryEff = perLo.map { case (k, v) => k -> (v / perHi(k)) / (hi.toDouble / lo) }
    def fmt(m: Map[String, Double]) =
      m.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val tiers = activePlan.map { case (q, f) => "\"" + q + "\":" + f }.mkString("{", ",", "}")
    println(s"""{"metric":"scaling","base":"$base","tiers":$tiers,"lo_cores":$lo,"hi_cores":$hi,"headline_total_sec_local$lo":$tLo,"headline_total_sec_local$hi":$tHi,"speedup":$speedup,"efficiency":$eff,"per_query_efficiency":${fmt(perQueryEff)},"local$lo":${fmt(perLo)},"local$hi":${fmt(perHi)}}""")
  }
}
