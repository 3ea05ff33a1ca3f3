package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-budget data selection: keep the highest-weight documents whose
  * cumulative token count fits a budget — "give me the best 500B tokens"
  * is how a pretraining data order is actually specified (quality-ranked
  * greedy fill; the budgeted counterpart of threshold filtering).
  *
  * Semantics (total order, reproducible): rank documents by
  * `(weight desc, id asc)`; select the maximal prefix whose running
  * token sum stays ≤ budget. Equivalent to the SQL window
  * `SUM(tokens) OVER (ORDER BY weight DESC, id) ≤ budget` — which is
  * exactly how the oracle replays it, with a different algorithm.
  *
  * Scale shape — the global sort the window formulation implies is NOT
  * run. The weight domain is integral and bounded (quality scores,
  * deciles, basis points… — same contract as
  * [[ExactPercentile.byHistogram]]), so:
  *  1. one aggregation builds the per-weight histogram
  *     `(weight, n_docs, sum_tokens)` — shuffle ∝ distinct weights;
  *  2. the cutoff weight `w*` (last fully-kept weight) and the residual
  *     budget inside the `w*` bucket come from scanning that
  *     model-sized table once (collected rows ∝ distinct weights);
  *  3. selection is a map-only filter for `weight > w*`, plus a running
  *     sum restricted to the single `w*` bucket (the only sort, sized
  *     by one bucket, not the corpus).
  */
object BudgetSelect {

  /** Documents selected under `budget` total tokens, as
    * `(id, weight, n_tokens)`. `weightCol`/`tokensCol` must be
    * non-negative integral columns; ids must be unique. */
  def selectByBudget(docs: DataFrame, idCol: String, weightCol: Column,
      tokensCol: Column, budget: Long, maxDistinctWeights: Int = 1 << 20)
      : DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val base = OpCaches.persist(docs.select(col(idCol).as("id"),
      weightCol.cast("long").as("weight"),
      tokensCol.cast("long").as("n_tokens")))
    val hist = base.groupBy("weight")
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
      .orderBy(desc("weight"))
      .collect()
    require(hist.length <= maxDistinctWeights,
      s"${hist.length} distinct weights exceed $maxDistinctWeights — " +
        "bucket the weight (deciles/basis points) or raise the bound")
    // walk the model-sized histogram: w* = first weight whose bucket
    // does not fit entirely; r = budget left for the w* bucket
    var remaining = budget
    var cut = Long.MinValue
    var cutFound = false
    hist.iterator.takeWhile(_ => !cutFound).foreach { r =>
      val t = r.getLong(1)
      if (t <= remaining) remaining -= t
      else { cut = r.getLong(0); cutFound = true }
    }
    val whole = if (cutFound) base.filter(col("weight") > cut)
      else base // every bucket fits: the whole corpus is selected
    val partial = if (!cutFound) None else {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
      Some(base.filter(col("weight") === cut)
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .filter(col("cum") <= remaining)
        .drop("cum"))
    }
    partial.fold(whole)(whole.union)
      .withColumnRenamed("id", idCol)
  }

  private val Window = org.apache.spark.sql.expressions.Window
}
