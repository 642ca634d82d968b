package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Lineage, Skew}

class LineageSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("runStage computes once, resumes from checkpoint, keeps lineage metrics") {
    val root = java.nio.file.Files.createTempDirectory("lineage").toString
    var computed = 0
    def stage() = Lineage.runStage(spark, root, "tiles", "pid") {
      computed += 1
      graft.sources.Synth.points(spark, dir).select(col("pid"), col("lon"), col("lat"))
    }
    val first = stage().count()
    val second = stage().count() // must resume, not recompute
    assert(computed == 1)
    assert(first == second && first == 6000)
    val m = Lineage.metrics(spark, root, "tiles")
    assert(m.agg(sum(col("row_count"))).head.getLong(0) == 6000)
    assert(m.columns.toSet == Set("partition_id", "row_count", "min_key", "max_key", "stage"))
    // interrupted stage (marker removed) recomputes
    java.nio.file.Files.delete(Lineage.donePath(root, "tiles"))
    stage()
    assert(computed == 2)
  }

  test("catalog-table lineage: V2 named-table checkpoint resumes; docs scan/sink roundtrip") {
    // The Iceberg contract, proven on the only catalog whose jars exist in
    // this sandbox (the V2 session catalog): same read/write calls, an
    // Iceberg catalog is pure spark.sql.catalog.* config.
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_ct LOCATION '$wh'")
    try {
      var computed = 0
      def stage() = Lineage.runStageTable(spark, "graft_ct.pipe", "docs", "doc_id") {
        computed += 1
        graft.sources.DocsTable.docs(spark, dir)
      }
      val first = stage().count()
      val second = stage().count() // resume from the committed tables
      assert(computed == 1)
      assert(first == second && first == 6000)
      val m = Lineage.metricsTable(spark, "graft_ct.pipe", "docs")
      assert(m.agg(sum(col("row_count"))).head.getLong(0) == 6000)

      // scan/sink contract on the exact input_hint shape: the interleaved
      // (doc_id, spans array<struct<kind,text,media_ref,offset>>) table
      // written to and read back from a named table preserves the
      // span-sequence invariant (kind, text, media_ref, order) per row
      val back = graft.sources.CatalogIO.read(spark, "table:graft_ct.pipe_docs")
      // (nullability legitimately loosens through the parquet roundtrip)
      assert(back.schema("spans").dataType.catalogString ==
        graft.sources.DocsTable.docs(spark, dir).schema("spans").dataType.catalogString)
      val orig = graft.sources.DocsTable.docs(spark, dir)
        .select(col("doc_id"), to_json(col("spans")).as("sj"))
      val rt = back.select(col("doc_id"), to_json(col("spans")).as("sj"))
      assert(rt.count() == 6000)
      assert(orig.exceptAll(rt).count() == 0 && rt.exceptAll(orig).count() == 0)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_ct CASCADE")
    }
  }

  test("salted repartition preserves results") {
    val pts = graft.sources.Synth.points(spark, dir).select(col("pid"), col("l_suppkey"))
    val plain = pts.groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
    val salted = Skew.saltedRepartition(pts, "l_suppkey", 8)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("adaptive cell split bounds hot cells") {
    import graft.functions.GeomFunctions._
    // concentrate points: everything at z0 → one giant cell
    val pts = graft.sources.Synth.points(spark, dir)
      .select(col("pid"), col("lon"), col("lat"))
      .withColumn("cell", st_cell_at(col("lon"), col("lat"), lit(0)))
    val before = pts.groupBy("cell").count().agg(max("count")).head.getLong(0)
    assert(before == 6000) // all in the single z0 cell
    val split = Skew.adaptiveCellSplit(pts, hotThreshold = 1000)
    val after = split.groupBy("cell").count().agg(max("count")).head.getLong(0)
    assert(after < before)
    // row count preserved
    assert(split.count() == 6000)
    // non-hot input is untouched
    val cold = pts.limit(0)
    assert(Skew.adaptiveCellSplit(cold, 10).count() == 0)
  }
}
