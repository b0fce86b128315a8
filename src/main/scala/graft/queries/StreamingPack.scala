package graft.queries

import graft.streaming.EventStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Real `readStream` pipelines over the events table, verified against the
  * same batch oracles as their relational twins — streamed and batch
  * results must be identical.
  */
object StreamingPack extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_hourly_stream" -> { (s, d) =>
      val out = EventStream.runToTable(
        EventStream.hourlyAgg(EventStream.readEvents(s, d)),
        OutputMode.Complete())
      out.orderBy(col("hour"), col("event_type"))
    },

    "st_sessionize_stateful" -> { (s, d) =>
      val out = EventStream.runToTable(
        EventStream.sessionize(EventStream.readEvents(s, d)).toDF(),
        OutputMode.Update())
      EventStream.latestSessions(out)
        .orderBy(col("user_id"), col("session_seq"))
    },
  )

  val oracle: Map[String, String] = Map(
    "st_hourly_stream" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        | event_type, count(*) AS n_events, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "st_sessionize_stateful" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, value, epoch_ms(ts) AS ms,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 30*60*1000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, value, ms,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq, CAST(count(*) AS BIGINT) AS n_events,
        |  max(ms) - min(ms) AS duration_ms, round(sum(value),2) AS sum_value
        |FROM sess GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
  )
}
