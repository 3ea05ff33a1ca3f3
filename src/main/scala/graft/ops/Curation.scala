package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation recipe — the composition a training-data
  * pipeline actually runs, built from this library's operators:
  *
  *   1. language filter ([[TextOps.langGuess]] against an allow-list),
  *   2. quality floor ([[TextOps.qualityScore]]),
  *   3. exact dedup ([[Dedup.exactDedup]] — keep the smallest id per text),
  *   4. optionally near-dup removal ([[Dedup.minhashNearDups]] pairs →
  *      [[Dedup.connectedComponents]] — keep the smallest id of each
  *      transitive duplicate cluster).
  *
  * Stages 1–3 fuse into ONE Catalyst plan (filters are per-row expressions,
  * the dedup is a single groupBy shuffle carrying (text-key, id), and the
  * semi-join back is broadcast-friendly); stage 4 adds the banded-LSH
  * shuffle only when enabled. At 100 TB the expensive decision — whether to
  * run near-dup removal — is an explicit flag, not a default.
  */
object Curation {

  /** Surviving documents after the curation recipe. Keeps the input
    * columns. `nearDup = true` additionally removes LSH near-duplicates,
    * keeping ONE document (the minimum id) per connected component of the
    * pair graph — note that this path runs Spark jobs EAGERLY at call
    * time (the component computation is iterative, see
    * [[Dedup.connectedComponents]]); with `nearDup = false` the result is
    * a single lazy plan. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      allowedLangs: Seq[String], minQuality: Int,
      nearDup: Boolean = false, nearDupMinSim: Double = 0.8): DataFrame = {
    val filtered = docs
      .filter(TextOps.langGuess(col(textCol)).isInCollection(allowedLangs))
      .filter(TextOps.qualityScore(col(textCol)) >= minQuality)
    val keep = Dedup.exactDedup(filtered, textCol, idCol)
      .select(col("keep_id").as(idCol))
    val deduped = filtered.join(keep, Seq(idCol), "left_semi")
    if (!nearDup) deduped
    else {
      // keep one doc per CONNECTED COMPONENT of the pair graph (transitive
      // closure), not per pair: pair-wise dropping over-deletes on chains
      val losers = Dedup.nearDupLosers(
          Dedup.minhashNearDups(deduped, idCol, textCol, minSim = nearDupMinSim))
        .select(col("id").as(idCol))
      deduped.join(losers, Seq(idCol), "left_anti")
    }
  }

  /** Per-group cap (anti-domination): keep at most `k` rows per value of
    * `groupCol`, preferring the smallest `orderCol` — the standard
    * "max N documents per domain" curation stage that stops a single
    * crawled host from dominating the training mix.
    *
    * Expressed as `row_number() <= k` over a window: ONE shuffle on the
    * group key, per-group sort bounded by the group size. When groups are
    * pathological (one domain holding a measurable fraction of the corpus)
    * the bounded-buffer alternative is [[graft.functions.TopKAggregator]]
    * (map-side partials carry at most k rows per key — see q70), at the
    * cost of re-joining for payload columns; for the typical many-domains
    * regime the window IS the right plan: Spark's window exec spills group
    * runs, and the filter prunes to ≤k rows per group before anything else
    * happens downstream. */
  def capPerGroup(df: DataFrame, groupCol: String, orderCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "cap must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Semantic (embedding-space) deduplication: documents whose embeddings
    * are near-identical in cosine are grouped transitively and only one
    * per cluster survives — the SemDeDup-style stage that catches
    * paraphrases and re-encodings lexical near-dup misses. Pure
    * composition of tested operators: LSH-bucketed cosine pairs
    * ([[Similarity.cosineNearDupPairs]], auto-width signatures + bucket
    * cap) → connected components ([[Dedup.connectedComponents]], eager —
    * see its execution note) → keep-min-id anti-join. Returns the
    * surviving rows of `docs`. */
  def semanticDedup(docs: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double = 0.99, maxBucket: Int = 4096): DataFrame = {
    val pairs = Similarity.cosineNearDupPairs(docs, idCol, vecCol,
      dim = dim, threshold = threshold, maxBucket = maxBucket)
    val losers = Dedup.nearDupLosers(pairs).select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }
}
