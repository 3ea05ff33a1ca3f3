package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Event-stream analytics on the `events` table (the batch equivalents of
  * the Structured Streaming operators in graft.streaming — windowed
  * aggregation and stateful sessionization; same logic, bounded input).
  *
  * Event-time handling is SCHEMA-DRIVEN ([[normalized]]): the driver has
  * shipped `events.ts` both as parquet TIMESTAMP(NANOS) (bound as an
  * epoch-nano long under `spark.sql.legacy.parquet.nanosAsLong=true`) and
  * as timestamp[us] (bound as TIMESTAMP / TIMESTAMP_NTZ). Hardcoding
  * either binding breaks on the other (the round-7 regression), so every
  * consumer goes through one normalization that branches on the BOUND
  * type, not the expected one. All conversions stay in exact integer
  * arithmetic — a double round-trip would corrupt (1.7e18 > 2^53).
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Canonical event-time columns derived from whatever type `ts` bound
    * as: `event_time` (TimestampType, µs precision — the windowing /
    * calendar column) and `ts_ns` (epoch-nano long — the exact-gap
    * arithmetic column).
    *
    *  - LongType: nanosAsLong-era data; `ts` IS epoch nanos. µs
    *    truncation via integer `div` (exact).
    *  - Timestamp / TimestampNTZ: µs-era data; `unix_micros` is exact and
    *    `* 1000` cannot overflow (µs since epoch ≈ 1.7e15 ≪ 2^63/1000).
    *    NTZ→TZ cast is exact under the session's UTC timezone
    *    (GraftSession pins `spark.sql.session.timeZone=UTC`).
    */
  def normalized(events: DataFrame): DataFrame = events.schema("ts").dataType match {
    case LongType =>
      events
        .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
        .withColumn("ts_ns", col("ts"))
    case TimestampType | TimestampNTZType =>
      val t = col("ts").cast(TimestampType)
      events
        .withColumn("event_time", t)
        .withColumn("ts_ns", unix_micros(t) * lit(1000L))
    case other => throw new IllegalArgumentException(
      s"events.ts bound as unsupported type $other (expected long / timestamp)")
  }

  /** The events table with the canonical columns attached. */
  def loadEvents(s: SparkSession, dir: String): DataFrame =
    normalized(load(s, dir, "events"))

  /** §2.11 tumbling-window aggregate (batch form): events per hour ×
    * event_type with deterministic revenue-style sums. */
  val q28EventsHourly: Q = (s, dir) => {
    loadEvents(s, dir)
      .groupBy(year(col("event_time")).as("y"), month(col("event_time")).as("m"),
        dayofmonth(col("event_time")).as("d"), hour(col("event_time")).as("h"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), lsum(col("value")).as("sum_value"))
      .orderBy("y", "m", "d", "h", "event_type")
  }

  /** Gap-based sessionization (30-min inactivity): lag window over each
    * user's ordered events, cumulative new-session flags. The batch twin of
    * flatMapGroupsWithState sessionization. All-integer output. */
  val q30Sessionize: Q = (s, dir) => {
    val byUser = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    val gapNs = 30L * 60 * 1000000000L
    loadEvents(s, dir)
      .withColumn("prev_ts", lag(col("ts_ns"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts_ns") - col("prev_ts") > gapNs, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum(col("new_session")).as("n_sessions"))
      .orderBy("user_id")
  }

  /** Cohort retention: users bucketed by FIRST-ACTIVE day, counted on
    * every later active day as an offset from their cohort — the
    * engagement curve every event pipeline reports. Scale shape: one
    * (user, day) distinct (shuffle ∝ active pairs), one bounded
    * per-user min, one join back on the user key; the cohort matrix
    * output is days² rows at most. Day bucketing uses truncating `div`
    * against the oracle's floor `//` — identical under the ts_ns >= 0
    * (post-1970) contract [[normalized]] data satisfies. */
  val q113Retention: Q = (s, dir) => {
    val dayNs = 86400L * 1000000000L
    val activity = loadEvents(s, dir)
      .select(col("user_id"), expr(s"ts_ns div $dayNs").as("day"))
      .distinct()
    val cohorts = activity.groupBy("user_id").agg(min("day").as("cohort_day"))
    activity.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset"))
      // activity is distinct at (user, day): one row per user per cell
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "offset")
  }

  val all: Map[String, Q] = Map(
    "q28_events_hourly" -> q28EventsHourly,
    "q30_sessionize" -> q30Sessionize,
    "q113_retention" -> q113Retention,
  )

  /** DuckDB oracles are written against the CURRENT testdata binding
    * (timestamp[us] → DuckDB TIMESTAMP; `epoch_us` is exact on it). */
  val oracles: Map[String, String] = Map(
    "q28_events_hourly" ->
      s"""SELECT CAST(EXTRACT(YEAR FROM CAST(ts AS TIMESTAMP)) AS INT) AS y,
         |CAST(EXTRACT(MONTH FROM CAST(ts AS TIMESTAMP)) AS INT) AS m,
         |CAST(EXTRACT(DAY FROM CAST(ts AS TIMESTAMP)) AS INT) AS d,
         |CAST(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) AS INT) AS h,
         |event_type, COUNT(*) AS n, ${sqlLsum("value")} AS sum_value
         |FROM events GROUP BY 1,2,3,4,5 ORDER BY 1,2,3,4,5""".stripMargin,
    "q30_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM (SELECT user_id, ts, event_id,
        |          LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |        FROM events))
        |SELECT user_id, COUNT(*) AS n_events,
        |CAST(SUM(new_session) AS BIGINT) AS n_sessions
        |FROM flagged GROUP BY 1 ORDER BY 1""".stripMargin,
    "q113_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |    (epoch_us(ts) * 1000) // 86400000000000 AS day FROM events),
        |c AS (SELECT user_id, MIN(day) AS cohort_day FROM a GROUP BY 1)
        |SELECT c.cohort_day, a.day - c.cohort_day AS offset,
        |  CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM a JOIN c USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
