package graft.etl

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

class IngestSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("fetch → land → shred: the raw zone round-trips through bronze") {
    val rawZone = java.nio.file.Files.createTempDirectory("graft_land").toString
    val written = Ingest.landPlaylists(new Ingest.FakeSpotifyClient(),
      Seq("plA", "plB", "weird?id:x"), rawZone)
    assert(written.length == 3)
    assert(written.exists(_.endsWith("playlist_weird_id_x_50.json")))
    val bronze = Bronze.shred(Bronze.readRaw(spark, rawZone))
    assert(bronze("playlists").count() == 3)
    assert(bronze("tracks").count() == 9) // fake emits 3 tracks per playlist
  }

  test("GraftExtensions registers without error and its expressions evaluate") {
    // a full --conf spark.sql.extensions integration needs a fresh JVM
    // (getOrCreate reuses the suite-shared session); exercise the wiring
    // and the expression eval path directly
    new graft.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val fp = graft.functions.RollingHashExpr(Literal("abc")).eval(null)
    assert(fp == (("a".codePointAt(0) * 31L + 'b') * 31 + 'c') % 2147483647L)
    assert(graft.functions.SimHashExpr(Literal("a b c")).eval(null).asInstanceOf[Long] != 0L)
  }
}
