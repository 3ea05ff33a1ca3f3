package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, ProjectExec, UnionExec}

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
  * re-pays the exchange and its stage round-trip).
  *
  * Parallelism is read from the PLANNED scan (the physical plan's
  * file-scan leaves), never from `df.rdd`: with AQE enabled, `df.rdd`
  * materializes the final adaptive plan, which EXECUTES any upstream
  * shuffle stages and then throws that lineage away — the real action
  * afterwards replans and re-runs them, silently doubling work.
  * Planning the subtree costs driver time only. The helper only acts
  * on exchange-free shapes (scan/project/filter/union — `sparkPlan` is
  * captured before EnsureRequirements, so exchanges can't be observed
  * directly; the whitelist is the set of nodes that never REQUIRE
  * one): any other operator, or a non-file leaf (cached relation,
  * local table), makes it a conservative no-op, so it can never stack
  * a second shuffle on a plan whose parallelism AQE already governs. */
object Spread {
  def toCores(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val plan = df.queryExecution.sparkPlan
    val unsafe = plan.exists {
      case _: ProjectExec | _: FilterExec | _: UnionExec => false
      case leaf if leaf.children.isEmpty => false
      case _ => true
    }
    if (unsafe) df
    else {
      val scanParts = plan.collectLeaves().map {
        case f: FileSourceScanExec => f.inputRDDs().map(_.getNumPartitions).sum
        case _ => target
      }.sum
      if (scanParts < target) df.repartition(target) else df
    }
  }

  /** [[toCores]] plus a PLAN BARRIER, for spreads that feed a wide
    * fused chain whose filters Catalyst would otherwise push back BELOW
    * the spread exchange. `PushPredicateThroughNonJoin` substitutes a
    * derived-column predicate through the projection and the
    * round-robin repartition onto the narrow scan side — re-serializing
    * the chain's whole expression tree onto the exact leg the spread
    * exists to widen (q133: the synthesized-URL `url_keep` tree, ~50 KB
    * of predicate, evaluated 2-way pre-exchange AND re-evaluated
    * post-exchange by the projection; measured 4.45 → 2.28 s).
    * Persisting the spread output (via [[OpCaches]], so `releaseAll`
    * keeps per-query hygiene) fixes the cached plan at the exchange:
    * consumers' filters evaluate OVER the 32-way cache, never below it.
    *
    * Scale-neutral like [[toCores]]: on a real corpus the scan is
    * already ≥ cores partitions, nothing fires, and NO corpus-sized
    * materialization happens — the cache exists only in the degenerate
    * tiny-scan case where it is bounded by the input's single row
    * group. When nothing fires, predicate pushdown to the scan stays
    * fully enabled (it is desirable there — the scan is already wide). */
  def toCoresCached(df: DataFrame): DataFrame = {
    val spread = toCores(df)
    if (spread eq df) df else OpCaches.persist(spread)
  }
}
