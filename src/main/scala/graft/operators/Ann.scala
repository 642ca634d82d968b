package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with a broadcast query set — exact,
  * linear in corpus size, the right plan when |queries| is small.
  * Scale path: LSH with deterministic pseudo-random hyperplanes — corpus
  * hashed once into 2^bits buckets, queries probe their own bucket (plus
  * optional multi-probe neighbors); recall traded for a bucket-local scan.
  *
  * Dot products run through `zip_with` + `aggregate` (codegen'd higher-
  * order functions, left-fold order — reproducible bit-for-bit).
  */
object Ann {

  /** left-fold Σ a[i]·b[i] in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Exact brute-force cosine top-k: queries broadcast, corpus scanned once.
    * queries(qid, qvec array<double>), corpus(vid, vec array<double>).
    * Norms are precomputed per side (each sqrt(Σx²) is bit-identical to an
    * inline computation, so the DuckDB oracle is unaffected) — one fold per
    * pair instead of three.
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid").asc)
    val qn = queries.withColumn("qnorm", sqrt(norm2(col("qvec"))))
    val cn = corpus.withColumn("vnorm", sqrt(norm2(col("vec"))))
    cn.join(broadcast(qn), col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"),
        (dot(col("qvec"), col("vec")) / (col("qnorm") * col("vnorm"))).as("cos"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a value in [-1, 1) from a splitmix-style integer hash — reproducible
    * across engines and runs with no RNG state.
    */
  private def planeComponent(p: Int, i: Int): Double = {
    var x = p.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
    x ^= (x >>> 27); x *= 0x94D049BB133111EBL
    x ^= (x >>> 31)
    (x >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  /** sign-random-projection bucket id for a vector (array<double>), using
    * `bits` hyperplanes over `dim` dimensions.
    */
  def lshBucket(vec: Column, dim: Int, bits: Int): Column = {
    (0 until bits).map { p =>
      val plane = array((0 until dim).map(i => lit(planeComponent(p, i))): _*)
      when(dot(vec, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed ANN: corpus bucketed once (one shuffle on bucket id);
    * each query scans only its bucket. Returns top-k per query by cosine
    * within the bucket (approximate: recall < 1).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int, bits: Int): DataFrame = {
    val qb = queries.withColumn("bucket", lshBucket(col("qvec"), dim, bits))
    val cb = corpus.withColumn("bucket", lshBucket(col("vec"), dim, bits))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid").asc)
    cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"), cosine(col("qvec"), col("vec")).as("cos"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }
}
