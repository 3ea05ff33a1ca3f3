package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the CCNet / fastText-classifier
  * pattern: train a document classifier whose POSITIVE class is a
  * reference slice the pipeline trusts (Wikipedia in CCNet; a curated
  * source set here) and the NEGATIVE class is the background corpus,
  * then keep/score documents by the model's log-odds. This complements
  * the heuristic scorers ([[TextOps.qualityScore]], Gopher/C4 rules):
  * heuristics encode what bad text LOOKS like, the classifier learns
  * what the trusted slice READS like.
  *
  * The model is multinomial Naive Bayes with Laplace smoothing over the
  * joint vocabulary — the closed-form member of the family (fastText's
  * logistic layer needs SGD; NB trains in ONE aggregation pass and is
  * the standard strong baseline for exactly this corpus-filtering use).
  *
  * Determinism: per-token log-odds are rounded to 8 decimals and carried
  * as integer 1e-8 units (the [[CorpusStats.unigramLogProb]]/idf
  * convention), so per-document sums are exact, order-independent, and
  * replayable by a SQL oracle.
  *
  * Scale shape (the q83 shape): distinct (doc, token) count rows from a
  * map-side partial aggregation — the shuffle never carries raw
  * occurrences; the model side is vocabulary-sized (broadcasts when
  * small, sort-merge otherwise); scoring is one token-keyed join plus a
  * per-doc sum. Training reads the corpus once.
  */
object QualityClassifier {

  /** Train: per-token integer-1e-8 log-odds
    * `ln((c_pos+1)/(totPos+V)) − ln((c_neg+1)/(totNeg+V))` over the
    * joint vocabulary (V = its size), where `isPositive` marks the
    * trusted reference rows. Returns `(tok, lo_x1e8)`. Tokens outside
    * the vocabulary score 0 at inference (both classes smooth to the
    * same unseen mass up to the shared denominators — the standard NB
    * out-of-vocabulary convention, and the one a SQL replay can mirror
    * exactly). */
  def fit(docs: DataFrame, textCol: String, isPositive: Column): DataFrame = {
    val counts = docs
      .select(isPositive.as("pos"), explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("c_neg"))
    val totals = counts.agg(sum(col("c_pos")).as("tot_pos"),
      sum(col("c_neg")).as("tot_neg"), count(lit(1)).as("v"))
    def lp(c: Column, tot: Column): Column =
      round(round(log((c + lit(1L)).cast("double") /
        (tot + col("v")).cast("double")), 8) * 1e8, 0).cast("long")
    counts.crossJoin(totals) // totals is ONE row — broadcast literal join
      .select(col("tok"),
        (lp(col("c_pos"), col("tot_pos")) -
          lp(col("c_neg"), col("tot_neg"))).as("lo_x1e8"))
  }

  /** Score: per-document summed log-odds under a [[fit]] model —
    * `(id, n_tokens, sum_lo_x1e8)`; positive sums read "more like the
    * reference slice than the background". Join is token-keyed on
    * distinct (doc, token) count rows; out-of-vocabulary tokens
    * contribute 0 but still count toward `n_tokens`. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val docTok = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("c"))
    docTok.join(model, Seq("tok"), "left")
      .groupBy(idCol)
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * coalesce(col("lo_x1e8"), lit(0L))).as("sum_lo_x1e8"))
  }
}
