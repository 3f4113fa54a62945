package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference record-contract semantics, re-expressed as composable
  * `DataFrame => DataFrame` transforms.
  *
  * The reference wraps every MQ message in a 2-element JSON-array
  * envelope `[{"key":"<putMillis>_<seq>"},{"value":"<payload>"}]`
  * (IBMMQReceiver.java:256-264) where `seq` is a synthesized
  * per-millisecond counter (IBMMQReceiver.java:250-254, 266-267).
  *
  * Scale note: key synthesis is a window over (ms-bucket) — the
  * partition key has very high cardinality (one per millisecond), so the
  * shuffle it induces is well-spread; no global sort or single-partition
  * funnel is required in batch form. The streaming form keeps a per-key
  * counter in state (see graft.streaming.StatefulOps).
  */
object Envelope {

  /** Millisecond event time of `ts` as a BIGINT column. */
  def eventMillis(ts: Column): Column = unix_millis(ts)

  /** A4: synthesize the reference's monotone event key
    * `<epochMillis>_<seqWithinMillis>` in batch form. `orderCol` is the
    * arrival-order proxy used to break ties inside one millisecond
    * (IBMMQReceiver.java:251-254 uses single-threaded arrival order).
    */
  def withSyntheticKey(df: DataFrame, ts: String, orderCol: String,
                       keyName: String = "key"): DataFrame = {
    val ms = eventMillis(col(ts))
    val w = Window.partitionBy(ms).orderBy(col(orderCol))
    df.withColumn(keyName, concat(ms.cast("string"), lit("_"),
      row_number().over(w).cast("string")))
  }

  /** A5: encode (key, value) into the reference's JSON-array envelope
    * string. The two array elements are differently-shaped objects
    * (`{"key":…}` then `{"value":…}`), so each struct is serialized
    * separately and concatenated — reproduces the reference's output
    * byte-for-byte for plain-text payloads.
    */
  def encode(key: Column, value: Column): Column =
    concat(lit("["), to_json(struct(key.as("key"))), lit(","),
      to_json(struct(value.as("value"))), lit("]"))

  /** A6: positional decode (README.md:12-14): element 0 → key,
    * element 1 → value. */
  def decodeKey(envelope: Column): Column =
    get_json_object(envelope, "$[0].key")

  def decodeValue(envelope: Column): Column =
    get_json_object(envelope, "$[1].value")

  /** Deterministic-survivor dedup: keep the first row per `keys` under
    * `order` (the reference's dedup-to-exactly-once consumer contract —
    * duplicates can arrive on crash between store() and MQ commit,
    * IBMMQReceiver.java:357-360).
    *
    * Scale note: one hash-partition shuffle on `keys`; survivors picked
    * with a per-key row_number, no global sort, AQE handles skewed keys.
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String],
                     order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
