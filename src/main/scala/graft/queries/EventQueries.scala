package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics on the `events` table (the batch equivalents of
  * the Structured Streaming operators in graft.streaming — windowed
  * aggregation and stateful sessionization; same logic, bounded input).
  *
  * The parquet `ts` column is TIMESTAMP(NANOS), which Spark reads as an
  * epoch-nano long under `spark.sql.legacy.parquet.nanosAsLong=true`
  * (GraftSession). `div` keeps the ns→µs conversion in exact integer
  * arithmetic (a double round-trip would corrupt: 1.7e18 > 2^53).
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Epoch-nanos long → TimestampType (µs truncation, exact). */
  private def tsCol = timestamp_micros(expr("ts div 1000"))

  /** §2.11 tumbling-window aggregate (batch form): events per hour ×
    * event_type with deterministic revenue-style sums. */
  val q28EventsHourly: Q = (s, dir) => {
    load(s, dir, "events")
      .withColumn("t", tsCol)
      .groupBy(year(col("t")).as("y"), month(col("t")).as("m"),
        dayofmonth(col("t")).as("d"), hour(col("t")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), lsum(col("value")).as("sum_value"))
      .orderBy("y", "m", "d", "h", "event_type")
  }

  /** Gap-based sessionization (30-min inactivity): lag window over each
    * user's ordered events, cumulative new-session flags. The batch twin of
    * flatMapGroupsWithState sessionization. All-integer output. */
  val q30Sessionize: Q = (s, dir) => {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapNs = 30L * 60 * 1000000000L
    load(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum(col("new_session")).as("n_sessions"))
      .orderBy("user_id")
  }

  val all: Map[String, Q] = Map(
    "q28_events_hourly" -> q28EventsHourly,
    "q30_sessionize" -> q30Sessionize,
  )

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
        |    CASE WHEN prev_ts IS NULL OR epoch_ns(ts) - epoch_ns(prev_ts) > 1800000000000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM (SELECT user_id, ts, event_id,
        |          LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |        FROM events))
        |SELECT user_id, COUNT(*) AS n_events,
        |CAST(SUM(new_session) AS BIGINT) AS n_sessions
        |FROM flagged GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
