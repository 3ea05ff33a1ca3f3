package graft.ops

import org.apache.spark.sql.DataFrame

/** Conditional scan spreading — the optimization guide's §2.5 remedy
  * for unsplittable inputs ("one huge unsplittable file … otherwise
  * repartition immediately after the read"), applied ONLY when the
  * plan's current parallelism is below the session's core count.
  *
  * The bench testdata is single-file, single-ROW-GROUP parquet: byte
  * splits cannot cross a row group, so scans plan as ONE task and every
  * per-row chain fused over them (tokenization, regex gates, media
  * synth/decode) runs single-threaded regardless of core count. On a
  * real corpus (≥ cores row groups) the condition is false and NO
  * exchange is added — the helper is scale-neutral by construction,
  * not a local[32] tuning constant.
  *
  * Use it where the spread cost is paid ONCE and amortized — in front
  * of a localCheckpoint / OpCaches.persist or a single heavy fused map —
  * never blanket on every load: the r14 measurements showed a blanket
  * per-load repartition LOSES on multi-job queries (each eager job
  * re-pays the exchange and its stage round-trip). */
object Spread {
  def toCores(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
