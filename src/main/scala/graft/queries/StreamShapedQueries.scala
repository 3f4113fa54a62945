package graft.queries

import graft.{QueryFn, Tables, rnd}
import graft.operators.Envelope
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-verifiable forms of the streaming semantics (SURVEY.md §2B):
  * tumbling / sliding / session windows over `events.ts`, the
  * reference's key synthesis + envelope round-trip (A4/A5/A6), and
  * deterministic-survivor dedup (the consumer-side exactly-once
  * contract). The true streaming forms live in graft.streaming and are
  * exercised by ScalaTest with MemoryStream.
  */
object StreamShapedQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  val queries: Map[String, QueryFn] = Map(

    "q_win_tumbling" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("cnt"),
          rnd(sum(col("value").cast("decimal(30,6)")).cast("double"), 2)
            .as("total"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
          .as("hour_start"), col("cnt"), col("total"))
        .orderBy("hour_start")
    }),

    "q_win_sliding" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
          .as("win_start"), col("cnt"))
        .orderBy("win_start")
    }),

    "q_win_session" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes")
          .as("w"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"), unix_micros(col("w.start"))
          .as("session_start_us"), col("cnt"))
        // null user_id sessions are real groups; pin null placement
        // (Spark asc = NULLS FIRST, DuckDB default = NULLS LAST)
        .orderBy(col("user_id").asc_nulls_first,
          col("session_start_us"))
    }),

    "q_dedup_key" -> ((s, d) => {
      Envelope.dedupKeepFirst(t(s, d, "events"),
          Seq("user_id", "event_type"), Seq(col("ts"), col("event_id")))
        .select("user_id", "event_type", "event_id")
        .orderBy(col("user_id").asc_nulls_first,
          col("event_type").asc_nulls_first)
    }),

    "q_key_synthesis" -> ((s, d) => {
      Envelope.withSyntheticKey(t(s, d, "events"), "ts", "event_id")
        .select("event_id", "key")
        .orderBy("event_id")
    }),

    "q_envelope_roundtrip" -> ((s, d) => {
      val keyed = Envelope.withSyntheticKey(t(s, d, "events"), "ts",
        "event_id")
      keyed
        .withColumn("env", Envelope.encode(col("key"), col("event_type")))
        .select(col("event_id"), col("env"),
          Envelope.decodeKey(col("env")).as("key2"),
          Envelope.decodeValue(col("env")).as("value2"))
        .orderBy("event_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_win_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  count(*) AS cnt,
        |  floor((CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS total
        |FROM events GROUP BY 1 ORDER BY hour_start""".stripMargin,

    "q_win_sliding" ->
      """WITH slid AS (
        |  SELECT make_timestamp((CAST(floor(epoch_ms(ts) / 900000) AS BIGINT)
        |           - i) * 900000 * 1000) AS win_start
        |  FROM events, (SELECT unnest([0, 1, 2, 3]) AS i) s)
        |SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
        |  count(*) AS cnt
        |FROM slid GROUP BY 1 ORDER BY win_start""".stripMargin,

    "q_win_session" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN prev_ts IS NULL
        |         OR ts - prev_ts >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new
        |  FROM o),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, epoch_us(min(ts)) AS session_start_us, count(*) AS cnt
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id NULLS FIRST, session_start_us""".stripMargin,

    "q_dedup_key" ->
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id NULLS FIRST, event_type NULLS FIRST""".stripMargin,

    "q_key_synthesis" ->
      """SELECT event_id,
        |  epoch_ms(ts) || '_' || row_number() OVER (
        |    PARTITION BY epoch_ms(ts) ORDER BY event_id) AS key
        |FROM events ORDER BY event_id""".stripMargin,

    "q_envelope_roundtrip" ->
      """WITH k AS (
        |  SELECT event_id, event_type,
        |    epoch_ms(ts) || '_' || row_number() OVER (
        |      PARTITION BY epoch_ms(ts) ORDER BY event_id) AS key
        |  FROM events)
        |SELECT event_id,
        |  '[{"key":"' || key || '"},{' ||
        |    CASE WHEN event_type IS NULL THEN ''
        |         ELSE '"value":"' || event_type || '"' END ||
        |  '}]' AS env,
        |  key AS key2, event_type AS value2
        |FROM k ORDER BY event_id""".stripMargin
  )
}
