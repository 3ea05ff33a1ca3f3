package graft.ops

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based laws for the round-10 text ops, over adversarial ASCII
  * soup (digits, dots, dashes, '@', brackets — the characters the PII
  * patterns are built from, arranged randomly to hunt boundary bugs):
  *
  *  - RESIDUAL LAW: after the full scrub chain, NO class pattern matches
  *    the output — redaction can't leave a redactable span behind, and
  *    replacement tokens can't conjure a new one;
  *  - scrub idempotence: scrubbing scrubbed text changes nothing;
  *  - normalizeText idempotence + case/punctuation insensitivity.
  *
  * Raw ScalaCheck generators with fixed seeds (the scalatestplus bridge
  * isn't in the offline cache) — each law samples 300 structured strings.
  */
class PiiPropertySpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  // fragments chosen to recombine into almost-PII at random joints
  private val frag: Gen[String] = Gen.oneOf(
    Gen.numStr.map(_.take(4)),
    Gen.alphaLowerStr.map(_.take(5)),
    Gen.oneOf(".", "-", " ", "@", "[", "]", "_", "%", "+"),
    Gen.oneOf("1.2.3.4", "555-123-4567", "a@b.cc", "10.0.0", "555-12",
      "x@y", ".com", "999 888 7777", "0.0.0.0.0", "example.com"))

  private val soup: Gen[String] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, frag)).map(_.mkString)

  private def samples(seedBase: Long, n: Int = 300): Seq[String] =
    (0 until n).flatMap(i => soup(Gen.Parameters.default, Seed(seedBase + i)))

  test("residual law: nothing redactable survives the scrub chain") {
    val df = samples(11L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val out = Pii.scrub(df, "text").cache()
    Pii.Classes.foreach { c =>
      val bad = out.filter(col("text_scrubbed").rlike(c.pattern))
      assert(bad.count() == 0, {
        val ex = bad.select("text", "text_scrubbed").take(3).toSeq
        s"${c.name} still matches after scrub: $ex"
      })
    }
    out.unpersist()
  }

  test("scrub idempotence: a second pass is the identity") {
    val df = samples(23L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val once = Pii.scrub(df, "text")
      .select(col("id"), col("text_scrubbed").as("text"))
    val twice = Pii.scrub(once, "text")
    val diff = twice.filter(col("text") =!= col("text_scrubbed"))
    assert(diff.count() == 0,
      s"not idempotent: ${diff.take(3).toSeq}")
  }

  test("normalizeText: idempotent; invariant under case and punct noise") {
    val df = samples(37L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val n1 = TextOps.normalizeText(col("text"))
    val bad = df.select(
      n1.as("a"),
      TextOps.normalizeText(TextOps.normalizeText(col("text"))).as("b"),
      TextOps.normalizeText(upper(col("text"))).as("c"),
      TextOps.normalizeText(concat(col("text"), lit(" !!"))).as("d"))
      .filter(col("a") =!= col("b") || col("a") =!= col("c") ||
        col("a") =!= col("d"))
    assert(bad.count() == 0, s"normalize laws broken: ${bad.take(3).toSeq}")
  }
}
