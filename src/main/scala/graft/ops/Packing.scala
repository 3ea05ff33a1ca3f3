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
