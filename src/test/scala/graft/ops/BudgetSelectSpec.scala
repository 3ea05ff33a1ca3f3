package graft.ops

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Budget-selection contract: the histogram-cutoff algorithm returns
  * EXACTLY the rows of the window-cumsum formulation (the semantics),
  * across budgets from zero to everything, including mid-bucket cuts
  * with id-ordered ties; and the distinct-weight guard trips before an
  * unbounded histogram is collected. */
class BudgetSelectSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  /** Ground truth by the window definition (global sort — fine in a test). */
  private def bruteForce(df: DataFrame, budget: Long): Set[(Long, Long, Long)] = {
    val w = Window.orderBy(desc("weight"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") <= budget)
      .select("doc_id", "weight", "n_tokens")
      .as[(Long, Long, Long)].collect().toSet
  }

  private def run(df: DataFrame, budget: Long): Set[(Long, Long, Long)] =
    BudgetSelect.selectByBudget(df, "doc_id", col("w"), col("t"), budget)
      .select(col("doc_id"), col("weight"), col("n_tokens"))
      .as[(Long, Long, Long)].collect().toSet

  private def corpus(): DataFrame = {
    // weights 0..9 (deterministic pseudo-random), tokens 1..50, with
    // several docs sharing each weight so mid-bucket cuts exercise the
    // id-ordered partial fill
    (0L until 500L).map { i =>
      (i, (i * 2654435761L % 10).abs, 1L + (i * 48271L % 50).abs)
    }.toDF("doc_id", "w", "t")
  }

  test("equals the window formulation at budgets from 0 to everything") {
    val df = corpus()
    val base = df.select(col("doc_id"), col("w").as("weight"), col("t").as("n_tokens"))
    val total = df.agg(sum("t")).head().getLong(0)
    for (budget <- Seq(0L, 1L, 37L, total / 10, total / 3, total - 1, total, total + 10)) {
      assert(run(df, budget) == bruteForce(base, budget), s"budget $budget")
      OpCaches.releaseAll()
    }
  }

  test("mid-bucket cut fills by id order and stops at the first overflow") {
    // one weight class only: budget lands mid-bucket; ids 0,1,2 fit
    // (3+3+3=9 ≤ 10), id 3 overflows, id 4 (1 token) is NOT back-filled
    val df = Seq((0L, 5L, 3L), (1L, 5L, 3L), (2L, 5L, 3L),
      (3L, 5L, 4L), (4L, 5L, 1L)).toDF("doc_id", "w", "t")
    assert(run(df, 10L).map(_._1) == Set(0L, 1L, 2L))
    OpCaches.releaseAll()
  }

  test("distinct-weight guard trips before collecting an unbounded histogram") {
    val df = (0L until 100L).map(i => (i, i, 1L)).toDF("doc_id", "w", "t")
    intercept[IllegalArgumentException] {
      BudgetSelect.selectByBudget(df, "doc_id", col("w"), col("t"),
        budget = 50L, maxDistinctWeights = 10)
    }
    OpCaches.releaseAll()
  }
}
