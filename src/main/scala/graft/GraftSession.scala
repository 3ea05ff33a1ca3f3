package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session defaults shared by Verify, Bench and tests.
  *
  * - shuffle.partitions sized to the local core count (not 200) — at
  *   cluster scale this would be set per-job to ~2-3× total cores or left
  *   to AQE coalescing.
  * - AQE on: runtime re-planning (skew-join splitting, partition
  *   coalescing) is part of the 100 TB design.
  * - parquet nanosAsLong: earlier driver testdata shipped `events.ts` as
  *   TIMESTAMP(NANOS), which Spark's vectorized reader rejects; this conf
  *   binds that encoding as an epoch-nano long. Current testdata is
  *   timestamp[us] (unaffected by the conf) — EventQueries.normalized
  *   branches on whichever type actually bound, so both eras work.
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // generated-class cache: the default is a 100-entry LRU shared by
      // every codegen unit (whole-stage bodies, projections, predicates,
      // orderings) — a multi-stage analytics suite thrashes it, so
      // re-running an IDENTICAL plan re-pays full Janino compilation
      // (measured r14: repeated q104 still burned 1.5 s of compile; see
      // OPTIMIZATION_r14.md). Scale-neutral driver-side setting: any
      // long-running driver re-planning similar queries benefits, and
      // the cost is bounded driver memory for cached classes.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.NativeFunctions.register(s)
    // media decode perf flag — process-global, documented at the method
    graft.ops.Multimodal.ensureImageIoMemCache()
    // per-session route to the optimizer rule GraftExtensions injects
    // cluster-wide (extensions only apply at session construction; this
    // works on the shared/reused session too)
    if (!s.experimental.extraOptimizations.contains(graft.plans.RewriteDotProduct))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ graft.plans.RewriteDotProduct
    s
  }
}
