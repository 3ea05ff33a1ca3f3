package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame

/** Whole-inventory physical-plan audit: for every SparkEntry query, count
  * the plan features that matter at 100 TB (exchanges, join strategies,
  * Expand, nested-loop joins, codegen'd operators) and write a markdown
  * table.
  *
  * PlanSpec asserts the load-bearing properties on specific queries; this
  * audit is the complementary sweep — every query, every round, one table
  * a reviewer can scan for shape regressions (a new SortMergeJoin where a
  * broadcast used to be, a surprise Expand, a nested-loop join that is
  * not a deliberate one-row verdict crossJoin).
  *
  * Coverage: the MAIN operator tree plus every tree inside the formatted
  * explain's `===== Subqueries =====` section (each `Subquery:N` block is
  * parsed as its own tree — operators hiding in scalar subqueries count).
  * The eager connected-components phase of q65/q66, which materializes
  * per-round and therefore never appears in those queries' lazy plans, is
  * audited explicitly: the `cc_round_large_star` / `cc_round_small_star`
  * rows below the main table capture one round's plan over a
  * checkpointed edge list — exactly the input shape the real loop feeds
  * each star step.
  *
  * {{{ runMain graft.tools.PlanAudit /root/testdata/sf0.001 PLAN_AUDIT.md }}}
  */
object PlanAudit {

  /** All operator-tree blocks of a formatted explain: the main tree (up
    * to the first blank line) plus each Subquery block's tree. Details
    * sections repeat operator names and must never be counted — blocks
    * end at the first blank line, before details start. */
  private[tools] def treeBlocks(plan: String): Seq[Seq[String]] = {
    val lines = plan.linesIterator.toVector
    val main = lines.takeWhile(_.trim.nonEmpty)
    val subs = lines.zipWithIndex
      .filter(_._1.startsWith("Subquery:"))
      .map { case (_, i) =>
        lines.drop(i + 1).takeWhile(_.trim.nonEmpty)
      }
    main +: subs
  }

  private def auditRow(name: String, df: => DataFrame): String =
    try {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val trees = treeBlocks(plan)
      def cnt(word: String): Int =
        trees.map(_.count(_.matches(s".*\\b$word\\b.*"))).sum
      // codegen'd operators carry a "* " marker in the formatted tree
      // ("* HashAggregate (5)", "+- * Project (3)"); tree lines hold only
      // operator names + ids, so the marker cannot be confused with
      // expression text (which lives in the details section)
      val codegen = trees.map(_.count(_.contains("* "))).sum
      val total = trees.map(_.size).sum - 1
      Seq(name, cnt("Exchange"), cnt("BroadcastHashJoin"), cnt("SortMergeJoin"),
        cnt("Expand"), cnt("BroadcastNestedLoopJoin") + cnt("CartesianProduct"),
        s"$codegen/$total").mkString("| ", " | ", " |")
    } catch {
      case e: Throwable => s"| $name | plan failed: ${e.getClass.getSimpleName} | | | | | |"
    } finally graft.ops.OpCaches.releaseAll()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "PLAN_AUDIT.md"
    val spark = graft.GraftSession.local()
    // static audit: AQE wraps plans in AdaptiveSparkPlan whose
    // pre-execution form hides codegen markers and defers join selection —
    // audit the deterministic static plan instead (the engine still runs
    // with AQE on; GraftSession/DEPLOY.md own that setting)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      auditRow(name, fn(spark, sfDir))
    }
    // the eager CC phase, one round, over the exact input shape the loop
    // feeds it: a checkpointed (LogicalRDD) canonical edge list derived
    // from the q65 near-dup pair plan
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = graft.ops.Dedup.minhashNearDups(docs, "doc_id", "text")
    val edges = pairs
      .filter(col("id_a") =!= col("id_b"))
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .distinct()
      .localCheckpoint()
    val ccRows = Seq(
      auditRow("cc_round_large_star", graft.ops.Dedup.ccLargeStar(edges)),
      auditRow("cc_round_small_star",
        graft.ops.Dedup.ccSmallStar(graft.ops.Dedup.ccLargeStar(edges)
          .localCheckpoint())))
    val header =
      s"""# Plan audit — physical-plan shape per query (sf dir: $sfDir)
         |
         |Columns: shuffles (Exchange, excluding ReusedExchange), broadcast
         |hash joins, sort-merge joins, Expand operators, nested-loop/cartesian
         |joins, and codegen'd operators / total operators — counted over the
         |MAIN tree plus every Subqueries-section tree. Nested-loop entries
         |correspond to deliberate ONE-ROW verdict-column crossJoins (the
         |q40/q47 oracle pattern) — PlanSpec asserts the dangerous cases
         |(near-dup pair joins, range join) stay equi-joins. The final
         |cc_round_* rows audit ONE round of the eager alternating-star
         |connected-components phase (q65/q66/q60) over a checkpointed edge
         |list — the loop's real per-round input shape, which the lazy plans
         |above cannot show. Regenerate:
         |`sbt "runMain graft.tools.PlanAudit <sfDir> PLAN_AUDIT.md"`.
         |
         || query | Exchange | BHJ | SMJ | Expand | nested-loop | codegen |
         ||---|---|---|---|---|---|---|""".stripMargin
    Files.writeString(Paths.get(out),
      header + "\n" + (rows ++ ccRows).mkString("\n") + "\n")
    println(s"[plan-audit] wrote $out (${rows.size + ccRows.size} rows)")
    spark.stop()
  }
}
