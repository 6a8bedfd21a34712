package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.Streams

/** Event-stream analytics over the `events` table — windowed
  * aggregation, gap-based sessionization, and JSON property extraction.
  * Beyond-reference extension surface (the reference has no streaming,
  * window, or JSON ops — SURVEY §0); the same Streams definitions run
  * under Structured Streaming (StreamingSpec proves batch/stream
  * parity).
  *
  * Money goes through integer cents; session boundaries compare
  * microsecond integers — both so Spark and DuckDB agree bit-for-bit.
  */
object EventQueries extends QueryPack {

  /** The events parquet stores timestamp[ns] (pyarrow), which Spark
    * surfaces as BIGINT nanos; truncate to microseconds with integer
    * division (ns values exceed double's 2^53 mantissa — a double
    * round-trip would corrupt them) — the same truncation DuckDB's
    * µs-resolution TIMESTAMP applies. */
  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q41_event_windows" -> { (s, dir) =>
      Streams.tumblingAgg(events(s, dir))
        .orderBy(col("ws"), col("event_type"))
    },

    "q42_sessionize" -> { (s, dir) =>
      Streams.sessionAgg(events(s, dir))
        .orderBy(col("user_id"), col("session_start"))
    },

    "q43_json_props" -> { (s, dir) =>
      events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k") > 50)
        .orderBy(col("event_id"))
    },

    // Custom keyed state (mapGroupsWithState) under the oracle gate: in
    // batch mode each group passes through the state function once, so
    // the running totals equal the plain aggregate — the same
    // definition streams with per-micro-batch updates (StreamingSpec).
    "q58_user_totals" -> { (s, dir) =>
      Streams.runningUserTotals(events(s, dir)).toDF()
        .orderBy(col("user_id"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q41_event_windows" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    // gap-based sessions: new session when the microsecond gap to the
    // previous event is >= 30 min (session_window's end bound is
    // exclusive, so exactly-gap starts a new session)
    "q42_sessionize" ->
      """WITH e AS (SELECT user_id, ts, epoch_us(ts) AS us FROM events),
        |m AS (SELECT user_id, ts,
        |    CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |s AS (SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, min(ts) AS session_start, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q43_json_props" ->
      """SELECT event_id, CAST(props->>'$.k' AS INT) AS k FROM events
        |WHERE CAST(props->>'$.k' AS INT) > 50
        |ORDER BY event_id""".stripMargin,
    "q58_user_totals" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
