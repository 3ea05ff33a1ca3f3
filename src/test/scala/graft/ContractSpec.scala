package graft

import graft.queries._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: SparkEntry is assembled by `++` over four
  * query maps — a duplicated key would silently shadow a query, and an
  * oracle without a query (or vice versa under a typo'd name) would turn
  * a hash-check into a silent no-op. Pin both. */
class ContractSpec extends AnyFunSuite {

  test("no query-name collisions across the query modules") {
    val sizes = Seq(CoreQueries.all, DataOpsQueries.all, EventQueries.all,
      ExtendedQueries.all).map(_.size).sum
    assert(SparkEntry.queries.size == sizes,
      "a ++ merge dropped a duplicated query name")
  }

  test("every oracle key has a query implementation") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("oracle coverage: EVERY query is SQL-checked (63+, zero rows-only)") {
    assert(SparkEntry.queries.size >= 63)
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked.isEmpty, s"queries without oracles: $unchecked")
  }

  test("every registered query ANALYZES against the current testdata") {
    // The round-7 lesson: a query that throws in Verify is silently
    // omitted from the driver's correctness compare (no err, no red row).
    // Forcing analysis here makes any schema break (e.g. the events.ts
    // nanos→µs change) a loud local test failure instead. Analysis only —
    // no execution — but eager model-building queries do their (sf0.001-
    // sized) collects, so this doubles as a construction smoke test.
    val spark = graft.GraftSession.builder("4").getOrCreate()
    val dir = "/root/testdata/sf0.001"
    graft.functions.NativeFunctions.register(spark)
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val r = try { fn(spark, dir).queryExecution.analyzed; None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
      graft.ops.OpCaches.releaseAll()
      r
    }
    assert(failures.isEmpty, s"\nqueries failing analysis:\n${failures.mkString("\n")}")
  }

  test("oracle SQL only references driver-provided tables") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val lower = sql.toLowerCase
      assert(tables.exists(lower.contains), s"$name references no known table")
    }
  }
}
