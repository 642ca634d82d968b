package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-parallelism scaling evidence (BASELINE.md measurement plan): the
  * same headline jobs on the same input at local[8] and local[32],
  * reporting throughput at both plus scaling efficiency
  * = (throughput_32 / throughput_8) / (32 / 8).
  *
  * Round-1 lesson (VERDICT.md): at 8× the only compute-bound job was q21
  * (0.93 efficiency); every sub-10 s job measured per-job fixed overhead,
  * dragging the aggregate to 0.67. Round 2 sizes each query's input so its
  * local[8] runtime is tens of seconds — compute-bound, overhead amortized:
  *   - q21 (quadratic-ish kNN join) keeps the ×8 replica (~47 s @ local[8]);
  *   - the map-heavy rest (q01/q03/q12/q29/q30) moves to a ×48 replica.
  * Each query uses ONE fixed input across both parallelism levels, which is
  * what the north rule's N-vs-4N criterion measures. Runs are interleaved
  * two rounds per parallelism and the per-query minimum taken, damping
  * sandbox CPU noise.
  */
object Scaling {

  private val heavy = Seq("q21_knn_cell") // ×8 replica
  private val wide = Seq( // ×48 replica
    "q01_tile_assign", "q03_pip_join", "q12_knn", "q29_makevalid",
    "q30_mvt_prepare")

  def prepareScaled(sfDir: String, outDir: String, factor: Int): Unit = {
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
    spark.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    java.nio.file.Files.write(java.nio.file.Paths.get(outDir, "_READY"), Array.emptyByteArray)
  }

  /** One session at `cpus`: warm up on sf0.001, then run each query on its
    * size-matched replica dir.
    */
  def runAt(cpus: Int, heavyDir: String, wideDir: String): Map[String, Double] = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    Bench.run(spark, "/root/testdata/sf0.001",
      qs.view.filterKeys(k => heavy.contains(k) || wide.contains(k)).toMap) // warm-up
    val perHeavy = Bench.run(spark, heavyDir, qs.view.filterKeys(heavy.contains).toMap)
    val perWide = Bench.run(spark, wideDir, qs.view.filterKeys(wide.contains).toMap)
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    perHeavy ++ perWide
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val heavyDir = "/tmp/graft_scaled8"
    val wideDir = "/tmp/graft_scaled48"
    prepareScaled(base, heavyDir, 8)
    prepareScaled(base, wideDir, 48)

    // interleaved rounds, per-query minimum; `once` = single round (for
    // retry loops gated on a host-contention probe — the sandbox host
    // intermittently caps deliverable cores below 32, which bounds any
    // measurable 8→32 efficiency regardless of plan quality)
    val once = args.contains("once")
    val r1a = runAt(8, heavyDir, wideDir)
    val r1b = runAt(32, heavyDir, wideDir)
    val r2a = if (once) r1a else runAt(8, heavyDir, wideDir)
    val r2b = if (once) r1b else runAt(32, heavyDir, wideDir)
    val per8 = r1a.map { case (k, v) => k -> math.min(v, r2a(k)) }
    val per32 = r1b.map { case (k, v) => k -> math.min(v, r2b(k)) }
    val t8 = per8.values.sum
    val t32 = per32.values.sum
    val speedup = t8 / t32
    val eff = speedup / (32.0 / 8.0)
    val perQueryEff = per8.map { case (k, v) => k -> (v / per32(k)) / 4.0 }
    def fmt(m: Map[String, Double]) =
      m.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"scaling","sf":"q21@8x, rest@48x lineitem of $base","headline_total_sec_local8":$t8,"headline_total_sec_local32":$t32,"speedup":$speedup,"efficiency":$eff,"per_query_efficiency":${fmt(perQueryEff)},"local8":${fmt(per8)},"local32":${fmt(per32)}}""")
  }
}
