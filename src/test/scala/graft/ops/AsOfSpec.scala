package graft.ops

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("as-of join picks the nearest earlier row, inclusive at equal ts") {
    import spark.implicits._
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (2L, 5L, "t3"), (2L, 50L, "t4"))
      .toDF("acct", "ts", "trade_id")
    val prices = Seq((1L, 5L, 100.0), (1L, 10L, 110.0), (1L, 15L, 120.0), (2L, 40L, 50.0))
      .toDF("acct", "pts", "price")

    val joined = AsOf.asofJoin(trades, prices, "acct", "ts", "pts", Seq("price"))
      .orderBy("trade_id")
      .collect()
      .map(r => (r.getAs[String]("trade_id"), r.getAs[Double]("price")))
      .toSeq

    // t1@10 → price@10 (equal ts inclusive); t2@20 → price@15;
    // t3@5 has no earlier price (inner drops); t4@50 → price@40
    assert(joined == Seq(("t1", 110.0), ("t2", 120.0), ("t4", 50.0)))
  }

  test("left variant keeps unmatched rows with null payload") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 1L, "early")).toDF("k", "ts", "id")
    val r = Seq((1L, 5L, 7L)).toDF("k", "rts", "payload")
    val out = AsOf.asofJoin(l, r, "k", "ts", "rts", Seq("payload"), joinType = "left")
      .orderBy("ts").collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(out(0).fieldIndex("payload"))) // ts=1 < first right
    assert(out(1).getLong(out(1).fieldIndex("payload")) == 7L)
  }
}
