package graft

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds.
  *
  * Each query is forced with a `noop`-format write — unlike `count()`,
  * this executes the full plan including projections (count() lets
  * Catalyst prune all columns and skip the actual work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    def force(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      finally graft.ops.OpCaches.releaseAll() // per-query cache hygiene
      (System.nanoTime() - t0) / 1e9
    }
    // optional comma-separated filter for local iteration (driver sets
    // only SF_DIR/CPUS/BENCH_OUT, so driver runs always bench everything)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // one warm-up of the first query amortizes JVM/codegen startup
    names.headOption.foreach(force)
    // min of two runs per query: second run benefits from JIT-warmed
    // codegen paths, min filters one-off GC/compilation noise
    val results = names.map { n =>
      val a = force(n)
      val b = force(n)
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Also land the JSON in a file: stdout goes through sbt's log framing,
    // which can wrap/prefix the line and break a machine parse.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: $e") }
    spark.stop()
  }
}
