package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level distributional statistics for training-data curation:
  * per-document token profiles (repetition / C4-style heuristic filters)
  * and corpus document-frequency / TF-IDF.
  *
  * Unlike [[TextOps]] (pure per-row Column expressions), these operators
  * aggregate ACROSS rows and therefore shuffle — the scale design keeps
  * every shuffle proportional to (doc, token) pair counts after map-side
  * partial aggregation, never to raw text bytes:
  *  - [[tokenProfile]]: explode → two-level groupBy; the first level
  *    combines per-partition, so the shuffle carries (doc, token, count)
  *    with one row per DISTINCT token per doc;
  *  - [[documentFrequency]]: distinct (doc, token) map-side, then a
  *    token-keyed count — shuffle ∝ vocabulary × docs containing it.
  */
object CorpusStats {

  /** Per-document token distribution profile: total / distinct token
    * counts, the top token's frequency, and the longest token. All-integer
    * outputs (engine-independent, SQL-replayable).
    *
    * Duplicate-token fraction `(n_tokens − n_distinct)/n_tokens` and
    * top-token coverage `top_count/n_tokens` are the word-level analogues
    * of the repeated-line / most-common-word filters used by large-scale
    * corpus curation recipes (duplicated-content removal before near-dup
    * detection). */
  def tokenProfile(docs: DataFrame, idCol: String, textCol: String,
      keep: Seq[String] = Nil): DataFrame = {
    val perTok = docs
      .select((col(idCol) +: keep.map(col)) :+
        explode(TextOps.tokens(col(textCol))).as("tok"): _*)
      .groupBy((idCol +: keep :+ "tok").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    perTok.groupBy((idCol +: keep).map(col): _*)
      .agg(
        sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_count"),
        max(length(col("tok"))).as("max_token_len"))
  }

  /** Document frequency per token: the number of documents containing each
    * token at least once. The distinct() is a map-side partial distinct on
    * (doc, token) — the shuffle never carries duplicate occurrences. */
  def documentFrequency(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .distinct()
      .groupBy("tok")
      .agg(count(lit(1)).as("df"))

  /** Inverse document frequency, rounded to 8 decimals so the `ln` (libm,
    * may differ in the last ulp across engines) compares exactly. */
  def idf(nDocs: Column, df: Column): Column =
    round(log(nDocs.cast("double") / df.cast("double")), 8)

  /** Adjacent token-pair (bigram) frequencies — the counting step of a
    * BPE-style vocabulary-training round (the most frequent pair is the
    * next merge). One explode + one partial-aggregating groupBy: shuffle
    * rows bounded by distinct pairs per partition, never raw occurrences.
    * Documents with fewer than two tokens contribute nothing (the size
    * guard also keeps ANSI mode happy — `slice` with a negative length
    * throws). */
  def bigramCounts(docs: DataFrame, textCol: String): DataFrame =
    bigramOccurrences(docs, textCol)
      .groupBy("pair")
      .agg(count(lit(1)).as("cnt"))

  /** One row per adjacent-pair OCCURRENCE (`pair` column, pre-aggregation)
    * — the raw stream [[bigramCounts]] groups and sketches
    * ([[CountMin]]) consume. */
  def bigramOccurrences(docs: DataFrame, textCol: String): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val pairs = when(size(toks) >= 2,
        zip_with(slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
          (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    docs.select(explode(pairs).as("pair"))
  }
}
