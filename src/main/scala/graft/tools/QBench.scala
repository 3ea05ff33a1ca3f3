package graft.tools

/** Targeted per-query bench: times only the named SparkEntry queries
  * (min of two noop-forced runs each) on SPARK_GRAFT_SF_DIR — the
  * fast inner loop for plan iteration, vs graft.Bench's full sweep.
  *
  * {{{ runMain graft.tools.QBench q32_percentile q52_approx_percentile }}}
  */
object QBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QBench <query_name>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    def force(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      graft.ops.OpCaches.releaseAll()
      (System.nanoTime() - t0) / 1e9
    }
    NativeWarmup.warmup(spark) // JIT the shared native helpers (Bench parity)
    args.headOption.foreach(force) // warm-up
    // SPARK_GRAFT_QBENCH_RUNS > 2 prints every run — the variance probe
    // (per-JVM bimodality shows up as a whole JVM being fast or slow;
    // min-of-2 inside one JVM cannot filter that)
    val runs = sys.env.get("SPARK_GRAFT_QBENCH_RUNS") match {
      case None => 2
      case Some(s) => s.toIntOption match {
        case Some(n) if n >= 1 => n
        case _ => sys.error(
          s"SPARK_GRAFT_QBENCH_RUNS must be a positive integer, got '$s'")
      }
    }
    args.foreach { n =>
      val ts = (1 to runs).map(_ => force(n))
      println(f"[qbench] $n min ${ts.min}%.2fs " +
        s"runs ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
