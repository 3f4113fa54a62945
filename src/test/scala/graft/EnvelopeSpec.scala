package graft

import graft.operators.Envelope
import org.apache.spark.sql.functions._

/** Reference record-contract semantics: key synthesis (A4, incl. the
  * same-millisecond burst repair), envelope round-trip (A5/A6), and
  * deterministic-survivor dedup. Cites IBMMQReceiver.java:250-267.
  */
class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  test("key synthesis assigns running counter within a millisecond") {
    // three messages in ms 1000, one in 1001, two in 1002
    val df = Seq(
      (1L, "1970-01-01 00:00:01.000"),
      (2L, "1970-01-01 00:00:01.000"),
      (3L, "1970-01-01 00:00:01.000"),
      (4L, "1970-01-01 00:00:01.001"),
      (5L, "1970-01-01 00:00:01.002"),
      (6L, "1970-01-01 00:00:01.002"))
      .toDF("event_id", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val keys = Envelope.withSyntheticKey(df, "ts", "event_id")
      .orderBy("event_id").select("key").as[String].collect()
    assert(keys.toSeq == Seq(
      "1000_1", "1000_2", "1000_3", "1001_1", "1002_1", "1002_2"))
  }

  test("keys are unique and event-time ordered under bursts") {
    val df = (1 to 500).map(i => (i.toLong, 1000L + i / 7))
      .toDF("event_id", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val keyed = Envelope.withSyntheticKey(df, "ts", "event_id")
    assert(keyed.select("key").distinct().count() == 500)
    // ordering by (ms, seq) matches ordering by event_id (arrival proxy)
    val ordered = keyed
      .withColumn("ms2", split(col("key"), "_").getItem(0).cast("long"))
      .withColumn("seq", split(col("key"), "_").getItem(1).cast("int"))
      .orderBy("ms2", "seq").select("event_id").as[Long].collect()
    assert(ordered.toSeq == (1L to 500L))
  }

  test("envelope encode produces the reference JSON shape and decodes back") {
    val df = Seq(("1000_1", "hello world"), ("1000_2", "payload2"))
      .toDF("key", "value")
    val enc = df.select(Envelope.encode(col("key"), col("value")).as("env"))
    val envs = enc.as[String].collect().toSeq
    assert(envs.contains("""[{"key":"1000_1"},{"value":"hello world"}]"""))
    val dec = enc.select(
      Envelope.decodeKey(col("env")).as("k"),
      Envelope.decodeValue(col("env")).as("v"))
      .as[(String, String)].collect().toMap
    assert(dec == Map("1000_1" -> "hello world", "1000_2" -> "payload2"))
  }

  test("dedupKeepFirst keeps deterministic survivor") {
    val df = Seq(
      ("k1", 3L, "c"), ("k1", 1L, "a"), ("k1", 2L, "b"),
      ("k2", 9L, "z"))
      .toDF("key", "arrival", "payload")
    val out = Envelope.dedupKeepFirst(df, Seq("key"),
        Seq(col("arrival"), col("payload")))
      .orderBy("key")
      .as[(String, Long, String)].collect().toSeq
    assert(out == Seq(("k1", 1L, "a"), ("k2", 9L, "z")))
  }
}
