package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence (BASELINE.md measurement plan): the
  * same headline jobs on the same input at local[8] and local[32],
  * reporting throughput at both plus scaling efficiency
  * = (throughput_32 / throughput_8) / (32 / 8).
  *
  * Headline jobs exercise the shuffle-bearing paths: the cell-keyed PIP
  * spatial join, the z15 tile assignment + z9 rollup, the cell-pruned kNN,
  * and the MVT tiler sink.
  */
object Scaling {

  // only jobs heavy enough that runtime measures throughput rather than
  // fixed job-scheduling overhead (sub-second queries anti-scale trivially)
  private val headline = Seq(
    "q12_knn", "q21_knn_cell", "q22_tiler_assign", "q29_makevalid",
    "q30_mvt_prepare", "q03_pip_join")

  def runAt(cpus: Int, sfDir: String): (Double, Map[String, Double]) = {
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
    val t0 = System.nanoTime()
    val per = Bench.run(spark, sfDir, qs)
    val total = (System.nanoTime() - t0) / 1e9
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    (total, per)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (t8, per8) = runAt(8, sfDir)
    val (t32, per32) = runAt(32, sfDir)
    val speedup = t8 / t32
    val eff = speedup / (32.0 / 8.0)
    def fmt(m: Map[String, Double]) =
      m.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"scaling","sf":"$sfDir","headline_total_sec_local8":$t8,"headline_total_sec_local32":$t32,"speedup":$speedup,"efficiency":$eff,"local8":${fmt(per8)},"local32":${fmt(per32)}}""")
  }
}
