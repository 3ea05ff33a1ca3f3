package graft.ops

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for int8 embedding quantization: range, zero handling, and
  * the dequantization error bound (scale/254 — half a quantization step —
  * plus double-rounding slack). */
class QuantizeSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("quantized values stay in [-127, 127]; error bounded by scale/254") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = Similarity.quantizeInt8(emb, "embedding")
    val audited = q.select(
      array_min(col("q_vec")).as("q_min"),
      array_max(col("q_vec")).as("q_max"),
      Similarity.dequantMaxErr(col("q_vec"), col("embedding"), col("q_scale"))
        .as("err"),
      (col("q_scale") / 254d + lit(1e-12)).as("bound"))
    assert(audited.filter(col("q_min") < -127 || col("q_max") > 127).count() == 0)
    assert(audited.filter(col("err") > col("bound")).count() == 0)
  }

  test("zero vectors quantize to zeros with scale 0") {
    import spark.implicits._
    val zero = Seq((1L, Array.fill(8)(0f))).toDF("vec_id", "embedding")
    val row = Similarity.quantizeInt8(zero, "embedding")
      .select(col("q_scale"),
        array_max(transform(col("q_vec"), abs(_))).as("mx")).head()
    assert(row.getDouble(0) == 0d && row.getInt(1) == 0)
  }

  test("quantization is scale-invariant up to the float grid") {
    import spark.implicits._
    val v = Array(0.5f, -1.0f, 0.25f, 0.125f)
    val df = Seq((1L, v), (2L, v.map(_ * 4f))).toDF("vec_id", "embedding")
    val qs = Similarity.quantizeInt8(df, "embedding")
      .orderBy("vec_id").select("q_vec").collect()
      .map(_.getSeq[Int](0))
    // powers of two scale exactly in float: identical quantized vectors
    assert(qs(0) == qs(1))
  }
}
