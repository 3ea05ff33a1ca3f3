package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}

/** The observe-checkpoint-iterate idiom shared by the eager iterative
  * operators ([[Dedup.connectedComponents]], [[CorpusStats.bpeTrain]],
  * and any future k-means refinement / label-propagation variant):
  *
  *  - control metrics (convergence sums, token counts) ride the SAME
  *    Spark job that materializes the round's `localCheckpoint()` as
  *    observed metrics — ONE job per round, because the wall clock of a
  *    small-data iterative loop on a real cluster is per-job scheduling
  *    latency, not the tiny shuffles;
  *  - `localCheckpoint` truncates lineage, keeping planning O(1) per
  *    round instead of growing by one join per iteration;
  *  - the PREVIOUS round's checkpoint blocks are released deterministically
  *    once the new round is live — executor storage would otherwise grow
  *    linearly with rounds until the ContextCleaner catches up (for a
  *    vocabulary-budget BPE run of k merges, k copies of the token
  *    corpus).
  */
object Iterative {

  /** Eagerly checkpoint `df`, riding `metrics` on the materialization job.
    * Returns the lineage-truncated frame and the observed-metrics row.
    * `releasePrev` drops the given prior-round checkpoint's blocks AFTER
    * the new one is live; never pass a frame later rounds still read
    * (e.g. a loop-invariant edge list). */
  def checkpointWithMetrics(df: DataFrame, name: String, metrics: Seq[Column],
      releasePrev: Option[DataFrame] = None): (DataFrame, Row) = {
    require(metrics.nonEmpty, "observe at least one control metric")
    val observed = df.observe(name, metrics.head, metrics.drop(1): _*)
    val ck = observed.localCheckpoint() // eager: runs the job, fills metrics
    releasePrev.foreach(release)
    (ck, observed.queryExecution.observedMetrics(name))
  }

  /** Deterministically release a `localCheckpoint()`ed frame's storage
    * (the persisted RDD behind its LogicalRDD leaf). No-op for frames
    * that are not checkpoint-backed. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
