package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, "Reciprocal rank
  * fusion outperforms Condorcet and individual rank learning methods",
  * SIGIR 2009): combine rankings from heterogeneous retrievers —
  * lexical BM25 (q96), dense ANN (q26/q48), priors — by
  * `score(d) = Σ_i 1/(k0 + rank_i(d))`, the standard hybrid-retrieval
  * merge (no score calibration needed, only ranks).
  *
  * Determinism: the reciprocal is computed in INTEGER 1e-12 units
  * (`10^12 div (k0 + rank)`) so the fused score is an order-independent
  * integer sum — double reciprocals would make a ≥3-system fusion
  * depend on addition order (IEEE + is commutative but not
  * associative), and an integer sum replays exactly in external SQL.
  * Distinct ranks keep distinct reciprocals for k0 + rank ≤ 10^6 —
  * far beyond any practical ranking depth; remaining ties break by id
  * in the consumer's ORDER BY.
  *
  * Scale shape: each input ranking is top-k sized (the output of a
  * TakeOrderedAndProject or bounded aggregation), so fusion is a union
  * plus ONE aggregation over Σk rows — negligible next to the
  * retrievers that produced the rankings. At 100 TB the cost lives in
  * the retrievers; the merge is model-sized by construction.
  */
object Fusion {

  /** Fuse rankings (each a DataFrame with `idCol` and an integer `rk`
    * column, rank 1 = best). Output: (idCol, n_systems, rrf_x1e12). */
  def rrf(rankings: Seq[DataFrame], idCol: String, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k0 >= 1, "k0 must be >= 1")
    val scored = rankings.map { r =>
      r.select(col(idCol),
        expr(s"1000000000000L div ($k0 + cast(rk as bigint))").as("rcp"))
    }.reduce(_ unionByName _)
    scored.groupBy(idCol)
      .agg(count(lit(1)).as("n_systems"), sum("rcp").as("rrf_x1e12"))
  }
}
