package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Scale design (100 TB / billions of vectors):
  *  - Brute-force top-k is the exactness baseline: one map stage computing
  *    the score + `TakeOrderedAndProject` (per-partition heap, driver
  *    merge). Linear scan, no shuffle — bounded by scan throughput.
  *  - The scale path is LSH bucketing (random hyperplane signatures):
  *    vectors hash into buckets; a query probes only its bucket (and
  *    optionally neighboring bands). The bucket join replaces the full
  *    scan with an equi-join shuffle on signature keys. An IVF variant
  *    would replace the hash with nearest-centroid assignment — same
  *    plumbing, different bucketing function.
  *
  * All dot products use `zip_with` + `aggregate` in double precision,
  * sequentially over the array — deterministic and codegen-friendly.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double in
    * index order (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k by cosine against a single query vector.
    * Compiles to scan → project(score) → TakeOrderedAndProject. */
  def bruteForceTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    vectors
      .select(col(idCol), cosine(col(vecCol), q).as("cosine_sim"))
      .orderBy(desc("cosine_sim"), asc(idCol))
      .limit(k)
  }

  /** Random-hyperplane LSH signature: `bits` sign bits of dot products with
    * deterministic pseudo-random hyperplanes (seeded, data-independent).
    * Hyperplane component j of plane i = hash31(i,j) mapped to [-1,1). */
  def hyperplaneSignature(vecCol: Column, dim: Int, bits: Int, seed: Int = 42): Column = {
    val planes: Seq[Seq[Double]] = (0 until bits).map { i =>
      (0 until dim).map { j =>
        // splitmix-style deterministic mix → [-1, 1)
        var z = (seed.toLong * 0x9E3779B97F4A7C15L) + i.toLong * 0xBF58476D1CE4E5B9L + j.toLong * 0x94D049BB133111EBL
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        (z.toDouble / Long.MaxValue.toDouble)
      }
    }
    val sigBits = planes.map { p =>
      val planeCol = array(p.map(lit(_)): _*)
      when(dot(vecCol, planeCol) >= 0, lit(1L)).otherwise(lit(0L))
    }
    // pack bits into a long (bits <= 60 to stay overflow-safe)
    sigBits.foldLeft(lit(0L))((acc, b) => acc * 2 + b)
  }

  /** Approximate NN: probe only the query's LSH bucket, then rank by exact
    * cosine within the bucket. `bits` trades recall for bucket size. */
  def lshTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], dim: Int, k: Int, bits: Int = 8): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    val querySig = hyperplaneSignature(q, dim, bits)
    vectors
      .withColumn("bucket", hyperplaneSignature(col(vecCol), dim, bits))
      .filter(col("bucket") === querySig)
      .select(col(idCol), cosine(col(vecCol), q).as("cosine_sim"))
      .orderBy(desc("cosine_sim"), asc(idCol))
      .limit(k)
  }

  /** All near-duplicate embedding pairs by cosine ≥ threshold, bucketed by
    * LSH signature so only same-bucket pairs are compared (the scale path;
    * exact pairs above ~0.9 cosine almost always share an 8-bit bucket). */
  def cosineNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double, bits: Int = 8): DataFrame = {
    val sigs = vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", hyperplaneSignature(col("v"), dim, bits))
    val a = sigs.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = sigs.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }
}
