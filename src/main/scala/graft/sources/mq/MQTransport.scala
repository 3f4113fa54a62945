package graft.sources.mq

import java.nio.charset.{Charset, StandardCharsets}
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.util.control.NonFatal

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
  /** CUMULATIVE count of messages ever observed on the queue — the
    * absolute end offset the source's `latestOffset` advances to, NOT
    * the instantaneous browse depth. The distinction bites destructive
    * transports: a real client in keepMessages=false mode removes
    * messages on commit, so a browse-depth implementation would SHRINK
    * past already-committed offsets and stall the stream forever
    * (latestOffset would never exceed the committed position again).
    * Implementations over destructive gets must keep a monotone
    * high-water mark (committed + currently observable). */
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

  /** Write side of the seam: append `payloads` to the queue atomically
    * under transaction id `txnId`; re-applying an already-applied
    * txnId must be a no-op. The real client maps this onto a syncpoint
    * unit of work (PUT*n + a txn-ledger marker, one commit); replays
    * after a failure therefore never double-deliver. Read-only
    * transports may leave this unimplemented.
    */
  def put(txnId: String, payloads: Seq[String]): Unit =
    throw new UnsupportedOperationException("transport is read-only")
}

/** IBM CCSID (coded character set id) → JVM charset. The reference
  * forces `rcvMessage.characterSet` from the `mqccsid` option before
  * reading the payload (IBMMQReceiver.java:242-249); the same decode
  * choice happens here at the transport boundary, where the bytes are.
  * Table covers the CCSIDs MQ deployments actually pin; anything else
  * falls back to the JVM's `CP<ccsid>`/`IBM<ccsid>` aliases.
  */
object MQCcsid {
  def charsetFor(ccsid: Int): Charset = ccsid match {
    case 1208 => StandardCharsets.UTF_8
    case 1200 | 13488 => StandardCharsets.UTF_16 // MQ UCS-2/UTF-16 ids
    case 819 => StandardCharsets.ISO_8859_1
    case 1252 => Charset.forName("windows-1252")
    // JVM names zero-pad to 3 digits: CCSID 37 is charset IBM037
    case 437 | 850 | 37 | 500 | 1047 => Charset.forName(f"IBM$ccsid%03d")
    case other =>
      try Charset.forName(s"CP$other")
      catch {
        case NonFatal(_) =>
          try Charset.forName(s"IBM$other")
          catch {
            case NonFatal(_) => throw new IllegalArgumentException(
              s"mqccsid $other has no JVM charset mapping")
          }
      }
  }
}

/** File-backed fake queue: `<dir>/queue.jsonl`, one message per line as
  * `<putMillis>\t<payload>`; appended over time by tests/producers.
  * `<dir>/committed` holds the destructive-get high-water mark (the
  * fake's ack ledger — messages before it are "gone" from the real
  * queue's perspective but kept on disk so replay within a run works,
  * exactly like a transactional browse cursor).
  *
  * `charset` decodes payload BYTES (reference A3: the queue hands over
  * bytes in the queue manager's CCSID, not strings).
  *
  * Not meant to be fast — meant to make the source's offset/commit
  * machinery fully testable offline.
  */
class FileMQTransport(dir: String,
                      charset: Charset = StandardCharsets.UTF_8,
                      clock: () => Long = () => System.currentTimeMillis())
  extends MQTransport {
  private def queueFile = Paths.get(dir, "queue.jsonl")
  private def committedFile = Paths.get(dir, "committed")

  /** BOM-free working charset: the generic "UTF-16"/"UTF-32" charsets
    * emit a byte-order mark PER ENCODE, so the append-based `put`
    * would inject a BOM mid-file on every transaction after the first
    * — decoding to a stray ﻿ that breaks `parse`'s `toLong`.
    * Normalizing to the explicit big-endian twin keeps both sides of
    * the fake consistent (the no-BOM decode default is BE too). */
  private val cs: Charset = charset.name() match {
    case "UTF-16" => StandardCharsets.UTF_16BE
    case "UTF-32" => Charset.forName("UTF-32BE")
    case _        => charset
  }

  /** The parsed queue, memoized on (size, mtime, fileKey). Without
    * this the double re-read and re-split its whole backing file on
    * EVERY depth()/read() call, so at bench scale (a 50k-line queue
    * probed by hundreds of micro-batch range reads) the ingest-door
    * throughput numbers measured fixture IO as much as gate cost. An
    * append changes size and mtime, so the transport's own writes
    * (append-only by contract) can never hit stale. External writers
    * are tolerated too (this class decodes their BOMs), and their
    * usual rewrite — write-temp-then-rename — swaps the inode, which
    * the fileKey component of the memo key catches even when length
    * and mtime both collide (round 16, ADVICE). The one residual
    * blind spot is a same-inode in-place rewrite of identical length
    * inside the filesystem's mtime granularity — no fixture or
    * contract behavior performs one, and an external writer that must
    * do so can touch the mtime forward to invalidate the memo. */
  // @transient: the memo must not ride Java serialization (FileTime
  // is not Serializable, and shipping a parsed 50k-line queue with
  // every task closure would defeat the point); a deserialized copy
  // starts cold and re-reads on first use.
  @transient @volatile private var cached:
    (Long, java.nio.file.attribute.FileTime, AnyRef, Vector[String]) =
    null
  private def lines(): Vector[String] =
    if (!Files.exists(queueFile)) Vector.empty
    else {
      // ONE stat call yields all three key components (fileKey is
      // null on filesystems that don't expose one — then the key
      // degrades to the r15 (size, mtime) form, no worse than before)
      val attrs = Files.readAttributes(queueFile,
        classOf[java.nio.file.attribute.BasicFileAttributes])
      val sz = attrs.size()
      val mt = attrs.lastModifiedTime()
      val fk = attrs.fileKey()
      val c = cached
      if (c != null && c._1 == sz && c._2 == mt && c._3 == fk) c._4
      else {
        val parsed = new String(Files.readAllBytes(queueFile), cs)
          .stripPrefix("﻿") // tolerate an externally-written BOM
          .split("\n", -1).toVector.map(_.stripSuffix("\r"))
          .filter(_.nonEmpty)
        cached = (sz, mt, fk, parsed)
        parsed
      }
    }

  private def parse(line: String): MQRecord = {
    val i = line.indexOf('\t')
    MQRecord(line.substring(0, i).toLong, 1, line.substring(i + 1))
  }

  override def depth(): Long = lines().size.toLong

  override def read(start: Long, end: Long): Iterator[MQRecord] =
    lines().slice(start.toInt, end.toInt).iterator.map(parse)

  override def commit(upTo: Long): Unit = {
    val prev = committed()
    if (upTo > prev) {
      // temp-file + atomic rename (the BatchIdGate pattern): an
      // in-place truncate-then-write would leave an EMPTY record if
      // the process dies between the two, wedging every later ack
      val tmp = Paths.get(dir, "committed.tmp")
      Files.write(tmp, upTo.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, committedFile,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** An unreadable record degrades to 0 — replay-from-start, the
    * at-least-once stance (the source's key dedup absorbs it) — never
    * a NumberFormatException crash loop on every subsequent ack. */
  def committed(): Long =
    if (!Files.exists(committedFile)) 0L
    else {
      val raw = new String(Files.readAllBytes(committedFile),
        StandardCharsets.UTF_8).trim
      try raw.toLong
      catch { case _: NumberFormatException => 0L }
    }

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

  /** MQQA_GET_INHIBITED analogue for the fake: a `<dir>/inhibited`
    * marker file plays the queue attribute the reference polls
    * (IBMMQReceiver.java:232-235) — lets the A10 stall gate be
    * exercised end-to-end offline. */
  override def inhibited: Boolean =
    Files.exists(Paths.get(dir, "inhibited"))

  private def txnsFile = Paths.get(dir, "txns")

  /** Applied-transaction ledger (the fake's syncpoint log). */
  def txnApplied(txnId: String): Boolean =
    Files.exists(txnsFile) &&
      new String(Files.readAllBytes(txnsFile), StandardCharsets.UTF_8)
        .split("\n", -1).contains(txnId)

  /** Idempotent transactional put. Queue lines land before the ledger
    * marker, so a crash between the two replays the txn — at-least-
    * once in the fake's crash window; the real client's syncpoint UOW
    * closes that window (PUTs + marker commit atomically). Payloads
    * are encoded with the transport charset, mirroring the read-side
    * decode (A3).
    */
  override def put(txnId: String, payloads: Seq[String]): Unit =
    FileMQTransport.lock.synchronized {
      require(!txnId.contains("\n"), "txnId must be single-line")
      if (!txnApplied(txnId)) {
        if (payloads.nonEmpty) {
          val now = clock()
          val block = payloads.map { p =>
            require(!p.contains("\n"), "payload must be single-line in " +
              "the file fake (real MQ payloads are arbitrary bytes)")
            s"$now\t$p\n"
          }.mkString
          Files.createDirectories(Paths.get(dir))
          Files.write(queueFile, block.getBytes(cs),
            StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        }
        Files.write(txnsFile, s"$txnId\n".getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      }
    }
}

object FileMQTransport {
  /** One JVM-wide put lock: the fake's stand-in for the queue
    * manager's serialization of puts. */
  private val lock = new Object
}

/** A13: retry-with-backoff around any transport. The reference reacts
  * to ANY receive-loop Throwable by disconnecting, sleeping a capped
  * backoff, reconnecting, and restarting the loop
  * (IBMMQReceiver.java:154-198, 219-225 — 600 s cap). Here the same
  * policy is a decorator on the transport seam, so it covers the file
  * fake in tests and the real client identically: each operation is
  * retried up to `maxAttempts` with exponential backoff capped at
  * `maxBackoffMs`; a real transport re-establishes its connection
  * inside the retried call (its `read` reconnects if the handle died),
  * which is exactly the reference's disconnect/reconnect cycle.
  *
  * `read` retries per SLICE of `sliceSize` messages, each slice
  * materialized inside its retry scope (a lazy iterator would escape
  * it and fail mid-consumption). Slicing bounds buffering even when
  * admission control is off — `ReadLimit.allAvailable` and the batch
  * scan plan ONE partition spanning the whole queue depth, and
  * buffering a multi-GB backlog in one Vector would OOM the reader.
  * Positional reads are idempotent, so a slice retry never re-emits
  * previously delivered messages.
  *
  * `sleep` is injectable so tests assert the backoff schedule instead
  * of waiting it out.
  */
class RetryingTransport(underlying: MQTransport, maxAttempts: Int,
                        initialBackoffMs: Long, maxBackoffMs: Long,
                        sleep: Long => Unit = Thread.sleep,
                        sliceSize: Long = 10000L)
  extends MQTransport {
  require(maxAttempts >= 1, "maxAttempts must be >= 1")
  require(sliceSize > 0, "sliceSize must be positive")

  private def withRetry[T](f: => T): T = {
    var attempt = 1
    var backoff = initialBackoffMs
    var last: Throwable = null
    while (attempt <= maxAttempts) {
      try return f
      catch {
        case NonFatal(e) =>
          last = e
          if (attempt < maxAttempts) {
            sleep(backoff)
            backoff = math.min(backoff * 2, maxBackoffMs)
          }
          attempt += 1
      }
    }
    throw last
  }

  override def depth(): Long = withRetry(underlying.depth())
  override def read(start: Long, end: Long): Iterator[MQRecord] =
    (start until end by sliceSize).iterator
      .flatMap(s => withRetry(
        underlying.read(s, math.min(s + sliceSize, end)).toVector))
  override def commit(upTo: Long): Unit = withRetry(underlying.commit(upTo))
  override def sameMillisPrefix(pos: Long): Int =
    withRetry(underlying.sameMillisPrefix(pos))
  override def inhibited: Boolean = underlying.inhibited
  // safe to retry blindly: put is idempotent by txnId
  override def put(txnId: String, payloads: Seq[String]): Unit =
    withRetry(underlying.put(txnId, payloads))
}
