package graft.queries

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Events-table type-robustness drill (round-7 regression pin): the driver
  * has shipped `events.ts` as TIMESTAMP(NANOS) (bound: epoch-nano long) and
  * as timestamp[us] (bound: TIMESTAMP / TIMESTAMP_NTZ). The engine must
  * produce IDENTICAL q28/q30 results on every encoding — this spec writes
  * the same event slice in all three and cross-checks, so the next
  * driver-side testdata regeneration cannot silently break event-time ops.
  */
class EventTypeSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  val sfDir = "/root/testdata/sf0.001"

  /** One fixture dir per encoding, each holding the SAME rows. */
  lazy val dirs: Map[String, String] = {
    val base = spark.read.parquet(s"$sfDir/events.parquet")
    // normalize whatever the current testdata is to epoch-nano longs first
    val nano = EventQueries.normalized(base)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts_ns"))
    val root = java.nio.file.Files.createTempDirectory("graft_events_enc")
    def write(name: String, tsCol: org.apache.spark.sql.Column): String = {
      val d = root.resolve(name).toString
      nano.withColumn("ts", tsCol)
        .select("event_id", "user_id", "event_type", "value", "ts")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      d
    }
    Map(
      "long_nanos" -> write("long_nanos", col("ts_ns")),
      "timestamp_us" -> write("timestamp_us",
        timestamp_micros(expr("ts_ns div 1000"))),
      "timestamp_ntz" -> write("timestamp_ntz",
        timestamp_micros(expr("ts_ns div 1000")).cast("timestamp_ntz")),
    )
  }

  test("normalized binds every encoding to the expected canonical types") {
    dirs.foreach { case (enc, d) =>
      val n = EventQueries.loadEvents(spark, d)
      assert(n.schema("event_time").dataType.typeName == "timestamp", enc)
      assert(n.schema("ts_ns").dataType.typeName == "long", enc)
    }
    // and the raw bindings really are three different types
    val raw = dirs.map { case (enc, d) =>
      enc -> spark.read.parquet(s"$d/events.parquet").schema("ts").dataType.typeName }
    assert(raw("long_nanos") == "long")
    assert(raw("timestamp_us") == "timestamp")
    assert(raw("timestamp_ntz") == "timestamp_ntz")
  }

  test("q28 hourly windows agree across all three ts encodings") {
    val results = dirs.map { case (enc, d) =>
      enc -> EventQueries.q28EventsHourly(spark, d).collect().toSeq }
    assert(results("long_nanos") == results("timestamp_us"))
    assert(results("long_nanos") == results("timestamp_ntz"))
    assert(results("long_nanos").nonEmpty)
  }

  test("q30 sessionization agrees across all three ts encodings") {
    val results = dirs.map { case (enc, d) =>
      enc -> EventQueries.q30Sessionize(spark, d).collect().toSeq }
    assert(results("long_nanos") == results("timestamp_us"))
    assert(results("long_nanos") == results("timestamp_ntz"))
    assert(results("long_nanos").nonEmpty)
  }
}
