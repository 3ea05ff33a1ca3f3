package graft.ops

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Naive-Bayes quality classifier contracts: reference-like documents
  * score positive and background-like negative (separability on a
  * planted vocabulary), out-of-vocabulary tokens contribute exactly 0,
  * and scores are partition-order independent (the integer log-odds
  * convention's whole point).
  */
class QualityClassifierSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  private def corpus() = Seq(
    (1L, true, "good clean prose text here"),
    (2L, true, "clean good text prose flows"),
    (3L, true, "prose text good and clean"),
    (4L, false, "spam junk noise garbage here"),
    (5L, false, "junk spam garbage noise blob"),
    (6L, false, "noise garbage spam junk blob")).toDF("id", "pos", "text")

  test("separability: planted vocabularies score with the right sign") {
    val df = corpus()
    val model = QualityClassifier.fit(df, "text", col("pos"))
    val scored = QualityClassifier.score(df, "id", "text", model)
      .join(df.select("id", "pos"), "id")
    val posScores = scored.filter(col("pos")).select("sum_lo_x1e8").as[Long].collect()
    val negScores = scored.filter(!col("pos")).select("sum_lo_x1e8").as[Long].collect()
    assert(posScores.forall(_ > 0), s"reference docs must score > 0: ${posScores.toSeq}")
    assert(negScores.forall(_ < 0), s"background docs must score < 0: ${negScores.toSeq}")
  }

  test("out-of-vocabulary tokens contribute exactly zero") {
    val df = corpus()
    val model = QualityClassifier.fit(df, "text", col("pos"))
    val unseen = Seq((7L, "zzz qqq www")).toDF("id", "text")
    val s = QualityClassifier.score(unseen, "id", "text", model).head()
    assert(s.getAs[Long]("n_tokens") == 3)
    assert(s.getAs[Long]("sum_lo_x1e8") == 0L)
  }

  test("scores are partition-order independent") {
    val df = corpus()
    val model = QualityClassifier.fit(df, "text", col("pos"))
    val a = QualityClassifier.score(df, "id", "text", model)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    val b = QualityClassifier.score(df.repartition(7), "id", "text",
      QualityClassifier.fit(df.repartition(5), "text", col("pos")))
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
  }
}
