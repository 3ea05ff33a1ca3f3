package graft.ops

import graft.GraftSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance-weighting contract: target-like documents outrank
  * off-distribution ones, the whole pipeline is deterministic (no RNG —
  * reruns produce identical weights), the model stays `buckets` longs
  * regardless of corpus size, and scoring is a map-only plan (no
  * exchange before the top-k). */
class DsirSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  private def corpus() = {
    // target-like docs share a vocabulary; noise docs use disjoint tokens
    val targetLike = (0L until 8L).map(i =>
      (i, s"the quick brown fox jumps over the lazy dog number $i", "tgt"))
    val noise = (100L until 108L).map(i =>
      (i, s"zzq qqz xzx wvw uvu tst number $i", "noise"))
    (targetLike ++ noise).toDF("doc_id", "text", "kind")
  }

  test("target-like documents outrank off-distribution noise") {
    val df = corpus()
    val model = Dsir.importanceModel(
      df.filter(col("kind") === "tgt"), df, "text", buckets = 256)
    val ranked = Dsir.selectTop(df, "doc_id", "text", model, k = 16)
      .join(df.select("doc_id", "kind"), "doc_id")
      .orderBy(desc("weight_x1e8"), col("doc_id"))
      .select("kind").as[String].collect()
    // every target-like doc scores above every noise doc
    assert(ranked.take(8).forall(_ == "tgt"), ranked.mkString(","))
    assert(ranked.drop(8).forall(_ == "noise"))
  }

  test("deterministic: rebuilt model and rescored weights are identical") {
    val df = corpus()
    def run() = {
      val m = Dsir.importanceModel(
        df.filter(col("kind") === "tgt"), df, "text", buckets = 256)
      (m.toSeq, Dsir.selectTop(df, "doc_id", "text", m, 16)
        .as[(Long, Long)].collect().toSeq)
    }
    assert(run() == run())
  }

  test("model is exactly `buckets` longs; every bucket defined (smoothing)") {
    val df = corpus()
    val model = Dsir.importanceModel(
      df.filter(col("kind") === "tgt"), df, "text", buckets = 64)
    assert(model.length == 64)
    // add-one smoothing leaves no zero-probability holes: buckets unseen
    // in both corpora carry the floor ratio ln((nr+B)/(nt+B)) rather
    // than an undefined value, and occupied buckets differ from it
    assert(model.distinct.length > 1)
    val bigB = 4096
    val sparse = Dsir.importanceModel(
      df.filter(col("kind") === "tgt"), df, "text", buckets = bigB)
    assert(sparse.length == bigB)
    // with far more buckets than grams, the modal value IS the floor:
    // positive, because the raw corpus is the larger one
    assert(sparse.groupBy(identity).maxBy(_._2.length)._1 > 0L)
  }

  test("scoring plan is map-only: no exchange below the top-k") {
    val df = corpus()
    val model = Dsir.importanceModel(
      df.filter(col("kind") === "tgt"), df, "text", buckets = 256)
    val plan = Dsir.selectTop(df, "doc_id", "text", model, 5)
      .queryExecution.executedPlan
    def collectNodes(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children ++ p.subqueries).flatMap(collectNodes)
    val names = collectNodes(plan).map(_.nodeName)
    assert(names.exists(_.contains("TakeOrderedAndProject")), names)
    assert(!names.exists(_.contains("Exchange")), names)
  }

  test("resample: top-k by (weight + seeded Gumbel), exactly the manual result") {
    val df = corpus()
    val model = Dsir.importanceModel(
      df.filter(col("kind") === "tgt"), df, "text", buckets = 256)
    val got = Dsir.resampleTop(df, "doc_id", "text", model, 6, seed = 7)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // law: key = weight + gumbel, ordered desc with id tiebreak
    got.foreach { case (_, w, g, k) => assert(k == w + g) }
    assert(got == got.sortBy { case (id, _, _, k) => (-k, id) })
    // manual: full scored set, take 6 by the same key
    val full = Dsir.resampleTop(df, "doc_id", "text", model, 100, seed = 7)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == full.take(6))
  }

  test("resample: deterministic per seed, seeds perturb the noise") {
    val df = corpus()
    val model = Dsir.importanceModel(
      df.filter(col("kind") === "tgt"), df, "text", buckets = 256)
    def run(seed: Int) = Dsir.resampleTop(df, "doc_id", "text", model, 16, seed)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(run(1) == run(1))
    val g1 = run(1).map(r => r._1 -> r._3).toMap
    val g2 = run(2).map(r => r._1 -> r._3).toMap
    assert(g1.keySet.exists(id => g2.contains(id) && g1(id) != g2(id)),
      "different seeds must draw different Gumbel noise")
  }

  test("resample plan is map-only: TakeOrderedAndProject, no exchange") {
    val df = corpus()
    val model = Dsir.importanceModel(
      df.filter(col("kind") === "tgt"), df, "text", buckets = 256)
    val plan = Dsir.resampleTop(df, "doc_id", "text", model, 5)
      .queryExecution.executedPlan
    def collectNodes(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children ++ p.subqueries).flatMap(collectNodes)
    val names = collectNodes(plan).map(_.nodeName)
    assert(names.exists(_.contains("TakeOrderedAndProject")), names)
    assert(!names.exists(_.contains("Exchange")), names)
  }

  test("grams: unigrams plus adjacent bigrams, single-token doc degrades") {
    val got = Seq(("a b c", 1)).toDF("t", "i")
      .select(Dsir.grams(col("t")).as("g")).as[Seq[String]].head()
    assert(got == Seq("a", "b", "c", "a b", "b c"))
    val one = Seq(("solo", 1)).toDF("t", "i")
      .select(Dsir.grams(col("t")).as("g")).as[Seq[String]].head()
    assert(one == Seq("solo"))
  }
}
