package graft.ops

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Prefix-filtered exact Jaccard join contract: the output is IDENTICAL
  * to brute-force all-pairs (losslessness of the prefix filter — the
  * property LSH can't give), thresholds behave monotonically, exact
  * duplicates score 10000 bp, and no plan node is a cartesian product.
  */
class SetJoinSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  /** Ground truth by a different algorithm: full cross join + exact
    * Jaccard on the same fingerprinted shingle sets. */
  private def bruteForce(df: DataFrame, shingleLen: Int,
      minBp: Int): Set[(Long, Long, Long)] = {
    val fps = df.select(col("doc_id").as("id"),
      array_distinct(transform(TextOps.wordShingles(col("text"), shingleLen),
        s => TextOps.fingerprint(s))).as("fps"))
    fps.as("a").crossJoin(fps.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        size(array_intersect(col("a.fps"), col("b.fps"))).cast("long").as("i"),
        size(array_union(col("a.fps"), col("b.fps"))).cast("long").as("u"))
      .filter(col("i") * 10000L >= lit(minBp.toLong) * col("u"))
      .select(col("id_a"), col("id_b"), expr("i * 10000 div u").as("bp"))
      .as[(Long, Long, Long)].collect().toSet
  }

  private def corpus(): DataFrame = {
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy cat tonight"), // near-dup of 1
      (3L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 1
      (4L, "a completely different sentence about spark shuffles and joins"),
      (5L, "a completely different sentence about spark shuffles and sorts"), // near-dup of 4
      (6L, "short doc"),
      (7L, "short doc"), // exact dup of 6, sub-shingle length
      (8L, "unrelated singleton text with its own private vocabulary here"))
    base.toDF("doc_id", "text")
  }

  test("output equals brute-force all-pairs at several thresholds") {
    val df = corpus()
    for (bp <- Seq(3000, 6000, 8000, 10000)) {
      val got = SetJoin.jaccardJoin(df, "doc_id", "text", 3, bp)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == bruteForce(df, 3, bp), s"threshold $bp")
    }
  }

  test("losslessness holds on a randomized overlapping corpus") {
    // deterministic pseudo-corpus with heavy shingle sharing: doc i uses
    // vocabulary words (i mod 7 .. i mod 7 + 9) so neighbors overlap a lot
    val vocab = ('a' to 'p').map(c => s"w$c")
    val docs = (0L until 40L).map { i =>
      val off = (i % 7).toInt
      (i, (0 until 10).map(j => vocab((off + j) % vocab.length)).mkString(" "))
    }.toDF("doc_id", "text")
    for (bp <- Seq(4000, 7000)) {
      val got = SetJoin.jaccardJoin(docs, "doc_id", "text", 3, bp)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == bruteForce(docs, 3, bp), s"threshold $bp")
    }
  }

  test("exact duplicates score 10000 bp, including sub-shingle-length docs") {
    val got = SetJoin.jaccardJoin(corpus(), "doc_id", "text", 3, 10000)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 10000L), (6L, 7L, 10000L)))
  }

  test("threshold is monotone: higher bp is a subset of lower bp") {
    val df = corpus()
    val lo = SetJoin.jaccardJoin(df, "doc_id", "text", 3, 3000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val hi = SetJoin.jaccardJoin(df, "doc_id", "text", 3, 8000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(hi.subsetOf(lo))
  }

  test("no cartesian/nested-loop node anywhere in the plan") {
    val plan = SetJoin.jaccardJoin(corpus(), "doc_id", "text", 3, 6000)
      .queryExecution.executedPlan
    def nodes(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children ++ p.subqueries).flatMap(nodes)
    val bad = nodes(plan).filter(n =>
      n.isInstanceOf[BroadcastNestedLoopJoinExec] ||
        n.nodeName.toLowerCase.contains("cartesian"))
    assert(bad.isEmpty, bad.map(_.nodeName))
  }
}
