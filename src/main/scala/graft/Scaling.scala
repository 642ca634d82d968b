package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-parallelism scaling evidence (BASELINE.md measurement plan): the
  * same headline jobs on the same input at local[8] and local[32],
  * reporting throughput at both plus scaling efficiency
  * = (throughput_32 / throughput_8) / (32 / 8).
  *
  * The driver's sf0.1 tables are small enough that fixed job-scheduling
  * overheads would dominate, so the harness first materializes an 8×
  * replica of lineitem (shifted keys — deterministic) to /tmp and runs the
  * headline queries on that. Runs are interleaved two rounds per
  * parallelism and the per-query minimum taken, damping sandbox CPU noise.
  */
object Scaling {

  private val headline = Seq(
    "q01_tile_assign", "q03_pip_join", "q12_knn", "q21_knn_cell",
    "q29_makevalid", "q30_mvt_prepare")

  def prepareScaled(sfDir: String, outDir: String): Unit = {
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(outDir, "_READY"))) return
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val replicated = (0 until 8).map { i =>
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

  def runAt(cpus: Int, sfDir: String): Map[String, Double] = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries.view.filterKeys(headline.contains).toMap
    Bench.run(spark, "/root/testdata/sf0.001", qs) // warm-up
    val per = Bench.run(spark, sfDir, qs)
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    per
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaled = "/tmp/graft_scaled"
    prepareScaled(base, scaled)

    // interleaved rounds, per-query minimum
    val r1a = runAt(8, scaled)
    val r1b = runAt(32, scaled)
    val r2a = runAt(8, scaled)
    val r2b = runAt(32, scaled)
    val per8 = r1a.map { case (k, v) => k -> math.min(v, r2a(k)) }
    val per32 = r1b.map { case (k, v) => k -> math.min(v, r2b(k)) }
    val t8 = per8.values.sum
    val t32 = per32.values.sum
    val speedup = t8 / t32
    val eff = speedup / (32.0 / 8.0)
    def fmt(m: Map[String, Double]) =
      m.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"scaling","sf":"$scaled (8x lineitem of $base)","headline_total_sec_local8":$t8,"headline_total_sec_local32":$t32,"speedup":$speedup,"efficiency":$eff,"local8":${fmt(per8)},"local32":${fmt(per32)}}""")
  }
}
