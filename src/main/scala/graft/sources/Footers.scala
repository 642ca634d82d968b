package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Project}

/** Exact row counts from parquet footer metadata — a driver-side metadata
  * read (~KB per file), NOT a Spark job. Operators whose SCORE depends on
  * the corpus size (tf-idf's N, the IVF fit's √N) previously paid a full
  * count() scan before the real query started; the footer count is the
  * same number for free. Unlike `Knn.zoomForPlan` (which samples 64
  * footers because a zoom pick only needs ~2× precision), this reads ALL
  * footers — the value feeds score arithmetic and must be exact.
  *
  * Footers are read on a bounded driver thread pool (16 threads): at the
  * 100 TB design point (~10^5 files) that is tens of seconds of metadata
  * I/O once per query plan, against a full-corpus scan job otherwise.
  */
object Footers {

  private val PoolSize = 16

  /** true iff every node between the plan root and its leaves preserves
    * row count (Project/alias only) — a Filter, Limit, Sample, Join,
    * Aggregate or Generate anywhere makes file-level counts wrong.
    */
  private def countPreserving(p: LogicalPlan): Boolean = p match {
    case pr: Project => countPreserving(pr.child)
    case _: LeafNode => true
    case _           => false
  }

  /** exact row count of `df` when it is a (projection of a) bare parquet
    * scan; None otherwise — callers fall back to `df.count()`.
    */
  def exactRowCount(df: DataFrame): Option[Long] = {
    if (!countPreserving(df.queryExecution.optimizedPlan)) return None
    val files = df.inputFiles
    if (files.isEmpty || !files.forall(_.endsWith(".parquet"))) return None
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(PoolSize, files.length))
    try {
      val futs = files.map { f =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = {
            val in = org.apache.parquet.hadoop.util.HadoopInputFile
              .fromPath(new org.apache.hadoop.fs.Path(f), conf)
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try r.getRecordCount finally r.close()
          }
        })
      }
      Some(futs.map(_.get()).sum)
    } finally pool.shutdown()
  }
}
