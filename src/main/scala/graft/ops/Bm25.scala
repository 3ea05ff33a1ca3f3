package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a document corpus (Robertson & Zaragoza,
  * "The Probabilistic Relevance Framework: BM25 and Beyond", 2009) —
  * the lexical counterpart of the embedding ANN family: given a bag of
  * query terms, return the k highest-scoring documents.
  *
  * Scale shape (two corpus reads, ever):
  *  1. MODEL — one aggregation computes `N` (docs), `T` (total tokens)
  *     and per-term document frequencies in a single pass (the per-term
  *     tf columns are map-side projections; the agg collapses to ONE
  *     row). Query sets are tens of terms, so the model is bytes.
  *  2. SCORING — a map-only whole-stage-codegen projection: each
  *     document computes its per-term tf and sums literal-weighted
  *     contributions; top-k via `orderBy().limit()` →
  *     TakeOrderedAndProject (per-partition heaps, no global sort).
  *
  * Engine-independence: with `k1 = 1.2`, `b = 0.75` and `avgdl = T/N`,
  * the per-term score `idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
  * rearranges to the exact rational `idf · 22·tf·T / (10·tf·T + 3·T +
  * 9·dl·N)` — integer numerator and denominator. The idf
  * `ln((2N+2)/(2·df+1))` (the +1-smoothed Robertson-Sparck-Jones form,
  * always positive) is rounded to 8 decimals and scaled to 1e-8 units
  * ([[Dsir]]/[[CorpusStats]] convention), and the rational factor is
  * evaluated with `div` in decimal(38,0) — bit-identical in any engine
  * with exact integer division. */
object Bm25 {

  /** Corpus statistics for a fixed query-term list: collected once,
    * literal-embedded into the scoring pass. */
  final case class Model(terms: Seq[String], idfX1e8: Seq[Long],
      nDocs: Long, totalTokens: Long)

  private def tf(toks: Column, term: String): Column =
    size(filter(toks, x => x === lit(term))).cast("long")

  /** One-pass model build: N, T, and df per query term, then the idf
    * table evaluated through an engine expression (not driver-side
    * Math.log) so the rounding convention replays in the oracle. */
  def fit(docs: DataFrame, textCol: String, terms: Seq[String]): Model = {
    require(terms.nonEmpty && terms.size <= 64, "terms must be 1..64")
    val toks = TextOps.tokens(col(textCol))
    val perDoc = docs.select(size(toks).cast("long").as("dl") +:
      terms.indices.map(i => tf(toks, terms(i)).as(s"tf$i")): _*)
    val aggs = sum(col("dl")).as("t") +: terms.indices.map(i =>
      sum((col(s"tf$i") > 0L).cast("long")).as(s"df$i"))
    val stats = perDoc.agg(count(lit(1)).as("n"), aggs: _*).head()
    val n = stats.getLong(0)
    val t = stats.getLong(1)
    val idf = docs.sparkSession.range(1)
      .select(terms.indices.map(i => round(round(
        log(lit((2 * n + 2).toDouble) /
          lit((2 * stats.getLong(2 + i) + 1).toDouble)), 8) * 1e8, 0)
        .cast("long").as(s"w$i")): _*)
      .head()
    Model(terms, terms.indices.map(idf.getLong(_)), n, t)
  }

  /** Top-k documents by BM25 score, `(id, score_x1e8)`, ties broken by
    * id — a total order. Map-only scan into TakeOrderedAndProject. */
  def topK(docs: DataFrame, idCol: String, textCol: String, model: Model,
      k: Int): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val base = docs.select(col(idCol) +: size(toks).cast("long").as("dl") +:
      model.terms.indices.map(i => tf(toks, model.terms(i)).as(s"tf$i")): _*)
    // numerator AND denominator accumulate in decimal(38,0) from the
    // first multiply — 10·tf·T alone can pass 2^63 on a 100 TB corpus
    val contrib = model.terms.indices.map { i =>
      s"""(cast(${model.idfX1e8(i)} as decimal(38,0)) * 22 * tf$i * ${model.totalTokens})
         | div (cast(tf$i as decimal(38,0)) * 10 * ${model.totalTokens}
         |      + cast(3 as decimal(38,0)) * ${model.totalTokens}
         |      + cast(dl as decimal(38,0)) * 9 * ${model.nDocs})""".stripMargin
    }
    base.select(col(idCol),
      expr(contrib.mkString("(", ") + (", ")")).cast("long").as("score_x1e8"))
      .orderBy(desc("score_x1e8"), col(idCol))
      .limit(k)
  }
}
