package graft.functions

import graft.GraftSession
import graft.ops.CorpusStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the Misra–Gries heavy-hitters summary. The q131 oracle
  * hash-checks the exact regime on the corpus; this spec pins the
  * APPROXIMATE-regime guarantees — the ones that must hold for any
  * partitioning and merge order — on an adversarially skewed stream. */
class MisraGriesSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  // skewed synthetic stream: two giants, a midfield, a long tail
  private val trueCounts: Map[String, Long] =
    Map("alpha" -> 1000L, "beta" -> 500L, "gamma" -> 120L) ++
      (1 to 50).map(i => s"tail$i" -> 5L).toMap
  private val n: Long = trueCounts.values.sum

  private def stream(parts: Int, seed: Long): org.apache.spark.sql.DataFrame = {
    val toks = trueCounts.toSeq.flatMap { case (t, c) => Seq.fill(c.toInt)(t) }
    val shuffled = new scala.util.Random(seed).shuffle(toks)
    shuffled.toDF("text").repartition(parts)
  }

  private def summarize(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    CorpusStats.heavyHitters(df, "text", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact regime (k >= distinct): equals the true counts under any partitioning") {
    for (parts <- Seq(1, 7, 32)) {
      val est = summarize(stream(parts, seed = parts), k = 64)
      assert(est == trueCounts, s"parts=$parts")
    }
  }

  test("approximate regime: never over-counts, bounded undercount, heavies always present") {
    for ((parts, seed) <- Seq((1, 1L), (8, 2L), (32, 3L))) {
      val k = 4
      val est = summarize(stream(parts, seed), k)
      assert(est.size <= k, s"summary exceeded capacity: ${est.size}")
      // est <= true for every tracked token
      est.foreach { case (t, e) =>
        assert(e <= trueCounts(t), s"over-count of $t: $e > ${trueCounts(t)}")
      }
      // every token with true > N/(k+1) is tracked, with undercount <= N/(k+1)
      val bound = n / (k + 1)
      trueCounts.filter(_._2 > bound).foreach { case (t, c) =>
        assert(est.contains(t), s"heavy token $t missing (parts=$parts)")
        assert(est(t) >= c - bound,
          s"undercount of $t beyond N/(k+1): ${est(t)} < ${c - bound}")
      }
    }
  }

  test("merge: over-capacity union subtracts the (k+1)-st count and caps at k") {
    val agg = new MisraGriesAggregator(2)
    val merged = agg.merge(Map("a" -> 10L, "b" -> 4L), Map("c" -> 6L, "d" -> 1L))
    // counts sorted: 10, 6, 4, 1 -> threshold (k+1)-st = 4
    assert(merged == Map("a" -> 6L, "c" -> 2L))
    // within capacity: plain sum
    assert(agg.merge(Map("a" -> 3L), Map("a" -> 2L, "b" -> 1L)) ==
      Map("a" -> 5L, "b" -> 1L))
  }

  test("reduce: decrement path drops zeros and never inserts the overflow token") {
    val agg = new MisraGriesAggregator(2)
    val full = Map("a" -> 3L, "b" -> 1L)
    val after = agg.reduce(full, "c")
    assert(after == Map("a" -> 2L))
    assert(agg.reduce(after, "c") == Map("a" -> 2L, "c" -> 1L))
  }
}
