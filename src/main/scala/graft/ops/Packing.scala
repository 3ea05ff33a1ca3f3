package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget packs (the concat-and-chunk shape used to build LM
  * training batches from variable-length documents).
  *
  * Semantics: within each shard, documents are taken in deterministic id
  * order; a document belongs to the pack in which its first token lands
  * (`pack_id = floor(tokens_before_doc / budget)`). That is the standard
  * "concatenate then chunk every `budget` tokens" regime — packs are
  * contiguous id ranges, reproducible, and independent of partitioning.
  *
  * Scale design: the running token total is a window over
  * (shard, id-order) — packing is per-SHARD on purpose. A global
  * `Window.orderBy` would funnel the whole corpus through one partition;
  * sharding by a corpus column (source, date, path prefix) keeps every
  * window partition-parallel, which is how a 100 TB corpus actually gets
  * packed (each shard becomes one or more training files).
  */
object Packing {

  /** Split every document into fixed-size token windows with a stride
    * (overlapping chunks — the context-window preprocessing step for
    * retrieval / embedding pipelines). One output row per chunk:
    * `(id, chunk_id, n_tokens, chunk_text)`; the final chunk may be
    * shorter. Pure per-row expressions (tokenize once, then a
    * transform-with-index over the chunk starts) — embarrassingly
    * parallel, no shuffle, whole plan in one map stage. */
  def chunkFixed(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 64, stride: Int = 32): DataFrame = {
    require(stride >= 1 && window >= stride,
      "need window >= stride >= 1 (gaps would drop tokens)")
    val toks = split(trim(col(textCol)), "\\s+")
    docs
      .select(col(idCol), toks.as("tk"))
      .select(col(idCol), explode(
        transform(sequence(lit(0), size(col("tk")) - 1, lit(stride)),
          (s, i) => struct(
            i.cast("long").as("chunk_id"),
            least(size(col("tk")) - s, lit(window)).cast("long").as("n_tokens"),
            concat_ws(" ", slice(col("tk"), s + 1, lit(window))).as("chunk_text"))))
        .as("c"))
      .select(col(idCol), col("c.chunk_id"), col("c.n_tokens"), col("c.chunk_text"))
  }

  /** Pack summary per (shard, pack): document count, token mass, and the
    * covered id range. `tokenBudget` is the pack size in whitespace tokens
    * ([[TextOps.tokenCount]] — swap in the subword estimate for BPE-ish
    * budgets). */
  def packGreedy(docs: DataFrame, shardCol: String, idCol: String,
      textCol: String, tokenBudget: Int): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(idCol)
    docs
      .select(col(shardCol), col(idCol),
        TextOps.tokenCount(col(textCol)).cast("long").as("toks"))
      .withColumn("cum", sum(col("toks")).over(w))
      .withColumn("pack_id",
        floor((col("cum") - col("toks")) / lit(tokenBudget.toDouble)).cast("long"))
      .groupBy(col(shardCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("sum_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
  }
}
