package graft.plans

import graft.GraftSession
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RewriteDotProductSpec extends AnyFunSuite {

  lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    graft.functions.NativeFunctions.register(s)
    if (!s.experimental.extraOptimizations.contains(RewriteDotProduct))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ RewriteDotProduct
    s
  }

  // non-nullable double arrays derived from the row id — the shape the
  // rewrite is allowed to touch
  private def vectors = spark.range(100).select(
    col("id"),
    transform(sequence(lit(1), lit(16)),
      i => (i + col("id")).cast("double")).as("a"),
    transform(sequence(lit(1), lit(16)),
      i => (i * 2 + col("id")).cast("double")).as("b"))

  test("HOF dot-product idiom is rewritten to the native expression") {
    val df = vectors.select(Similarity.dotHof(col("a"), col("b")).as("dot"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dotproduct") || optimized.contains("DotProduct"),
      s"rule did not fire:\n$optimized")
    assert(!optimized.contains("aggregate("), s"HOF survived:\n$optimized")
  }

  test("rewritten plan is bit-identical to the interpreted HOF result") {
    val withRule = vectors.select(col("id"), Similarity.dotHof(col("a"), col("b")).as("dot"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // compute the reference values without the rule by evaluating the
    // native expression directly (pinned == HOF in FunctionsSpec)
    val native = vectors.select(col("id"), Similarity.dot(col("a"), col("b")).as("dot"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(withRule == native)
  }

  test("nullable-element arrays are left on the HOF path") {
    // parquet float arrays have containsNull=true → the rewrite must not fire
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = emb.select(Similarity.dotHof(col("embedding"), col("embedding")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("aggregate("), s"rewrite fired on nullable arrays:\n$optimized")
  }

  test("unrelated folds are not rewritten") {
    // same shape but zero=1.0 — a different fold, must survive untouched
    val df = vectors.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(1.0), (acc, v) => acc + v).as("notdot"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("aggregate("), optimized)
  }

  test("GraftExtensions injects the rule without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    // rule application on an analyzed plan is a no-op crash check here;
    // the injection surface itself is what this pins
    val plan = vectors.queryExecution.analyzed
    assert(RewriteDotProduct(plan) != null)
  }
}
