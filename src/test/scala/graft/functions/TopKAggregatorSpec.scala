package graft.functions

import graft.GraftSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggregatorSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("typed top-k aggregator matches the window row_number formulation") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))

    val viaAgg = orders
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .agg(new TopKAggregator[(Long, Double, Long)](3, _._2, _._3)
        .toColumn.name("top"))
      .flatMap { case (cust, top) => top.map(t => (cust, t._2, t._1)) }
      .toDF("o_custkey", "o_orderkey", "o_totalprice")

    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")

    assert(viaAgg.count() == viaWindow.count())
    assert(viaAgg.except(viaWindow).count() == 0)
    assert(viaWindow.except(viaAgg).count() == 0)
  }

  test("typed gold models bind to the gold frames") {
    import graft.etl._
    val rawDir = java.nio.file.Files.createTempDirectory("graft_typed")
    java.nio.file.Files.writeString(rawDir.resolve("p.json"),
      new Ingest.FakeSpotifyClient().fetchPlaylist("typed1"))
    val gold = Gold.build(Silver.projectAll(Bronze.shred(Bronze.readRaw(spark, rawDir.toString))))
    val (playlists, albums, artists, fact) = Models.typedGold(gold)
    assert(playlists.collect().head.playlist_id == "typed1")
    assert(albums.count() == 3 && artists.count() == 3)
    val f = fact.collect()
    assert(f.length == 3)
    assert(f.forall(_.playlist_id == "typed1"))
    assert(f.forall(_.track_duration_ms.exists(_ > 0)))
  }
}
