package graft.tools

/** Plan inspector for any registered query: prints exchange / scan /
  * cache-scan counts and the formatted plan. Drill tooling, not part of
  * the driver contract.
  *
  * Usage: `runMain graft.tools.ExplainQuery <query_name> [sfDir] [outFile]`
  * (outFile: also land the header + formatted plan there, unwrapped by
  * any build-tool log framing — the plans/r14 evidence flow)
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q133_web_curation")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.local()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    def n(p: String) = p.r.findAllIn(plan).length
    val header = s"[$name] exchanges=${n("Exchange")} scans=${n("FileScan")} " +
      s"cacheScans=${n("InMemoryTableScan")}"
    println(header)
    df.explain("formatted")
    args.lift(2).foreach { out =>
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
        header + "\n" + formatted)
    }
    graft.ops.OpCaches.releaseAll()
    spark.stop()
  }
}
