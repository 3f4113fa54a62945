package graft.sources.mq

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** One message as the queue manager hands it over: MQMD put time
  * (millisecond resolution — IBMMQReceiver.java:250), the native
  * per-group sequence number (:251), and the decoded payload (:247-249).
  */
case class MQRecord(putMillis: Long, nativeSeq: Int, payload: String)

/** The transport seam between the Spark source and the queue system.
  *
  * The real `com.ibm.mq.allclient` implementation drops in behind this
  * trait (connection/auth/backoff live inside it — reference A13/A15);
  * tests and offline builds use [[FileMQTransport]]. All methods are
  * positional so the source is REPLAYABLE between checkpointed offsets
  * — the property Structured Streaming needs for exactly-once
  * (SURVEY.md §3.3): `read(start, end)` must return the same messages
  * on every call until `commit(end)` is acknowledged.
  */
trait MQTransport extends Serializable {
  /** Number of messages currently observable (browse depth). */
  def depth(): Long

  /** Replayable ordered range read of positions [start, end). */
  def read(start: Long, end: Long): Iterator[MQRecord]

  /** Destructive-get acknowledgement up to position `upTo` (exclusive)
    * — the `qmgr.commit()` analogue (IBMMQReceiver.java:357-360). Must
    * be idempotent and monotone. */
  def commit(upTo: Long): Unit

  /** How many consecutive messages immediately before `pos` share the
    * millisecond of the message AT `pos`. Lets a reader resume the
    * reference's per-millisecond counter (A4) mid-stream without
    * cross-batch mutable state. */
  def sameMillisPrefix(pos: Long): Int

  /** MQQA_GET_INHIBITED analogue (IBMMQReceiver.java:232-235). */
  def inhibited: Boolean = false
}

/** File-backed fake queue: `<dir>/queue.jsonl`, one message per line as
  * `<putMillis>\t<payload>`; appended over time by tests/producers.
  * `<dir>/committed` holds the destructive-get high-water mark (the
  * fake's ack ledger — messages before it are "gone" from the real
  * queue's perspective but kept on disk so replay within a run works,
  * exactly like a transactional browse cursor).
  *
  * Not meant to be fast — meant to make the source's offset/commit
  * machinery fully testable offline.
  */
class FileMQTransport(dir: String) extends MQTransport {
  private def queueFile = Paths.get(dir, "queue.jsonl")
  private def committedFile = Paths.get(dir, "committed")

  private def lines(): Vector[String] =
    if (Files.exists(queueFile))
      Files.readAllLines(queueFile, StandardCharsets.UTF_8).asScala.toVector
    else Vector.empty

  private def parse(line: String): MQRecord = {
    val i = line.indexOf('\t')
    MQRecord(line.substring(0, i).toLong, 1, line.substring(i + 1))
  }

  override def depth(): Long = lines().size.toLong

  override def read(start: Long, end: Long): Iterator[MQRecord] =
    lines().slice(start.toInt, end.toInt).iterator.map(parse)

  override def commit(upTo: Long): Unit = {
    val prev = committed()
    if (upTo > prev)
      Files.write(committedFile, upTo.toString.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  def committed(): Long =
    if (Files.exists(committedFile))
      new String(Files.readAllBytes(committedFile), StandardCharsets.UTF_8)
        .trim.toLong
    else 0L

  override def sameMillisPrefix(pos: Long): Int = {
    val ls = lines()
    if (pos <= 0 || pos >= ls.size) 0
    else {
      val ms = parse(ls(pos.toInt)).putMillis
      var n = 0
      var i = pos.toInt - 1
      while (i >= 0 && parse(ls(i)).putMillis == ms) { n += 1; i -= 1 }
      n
    }
  }
}
