package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import graft.sources.mq.{FileMQTransport, MQOptions, MQTransport}
import org.apache.spark.sql.streaming.Trigger

/** One queue under test, seen from both sides: the seam handle the
  * source consumes through, and the external producer that lands
  * messages on it. A fixture is created fresh per test (fresh queue).
  * Capabilities a transport may not offer (txn-ledger put, an inhibit
  * switch, a halt file the driver can reach) are opt-in flags so the
  * suite degrades to exactly the behaviors a deployment supports.
  */
trait MQContractFixture {
  /** Wiring for `MQOptions` / `format("ibmmq")` reads of this queue
    * (file fixture: a path; a broker fixture: host/qmgr/channel/queue). */
  def options: Map[String, String]

  /** Fresh seam handle over the SAME queue — "fresh" models a driver
    * restart, so state recovered from the queue/checkpoint only. */
  def transport(): MQTransport

  /** External producer: land `(putMillis, payload)` messages on the
    * queue, after any already published. */
  def publish(records: (Long, String)*): Unit

  /** Whether `put(txnId, ...)` replay-dedups via a txn ledger (the
    * file fake does; the real client leaves the ledger to site
    * policy — see IbmMqClientTransport.put). */
  def supportsPutLedger: Boolean = false

  /** Whether the fixture can flip the queue's GET-inhibited attribute
    * (A10). */
  def supportsInhibit: Boolean = false
  def setInhibited(on: Boolean): Unit =
    throw new UnsupportedOperationException("fixture has no inhibit control")

  /** A driver-reachable path for the A9 halt file, if the deployment
    * has one. */
  def haltFileLocation: Option[Path] = None
}

/** The MQ behavioral contract (reference A1–A15 behaviors that do not
  * need broker-specific byte control), parameterized over the
  * transport via [[MQContractFixture]] — instantiate it per transport
  * and the WHOLE suite runs unchanged. [[FileMQTransportContractSpec]]
  * is the offline instance; the real-client adapter inherits it with
  * one line the day the jar exists (contrib/ibmmq-client/README.md).
  * Deeper file-transport-specific coverage (crash windows, CCSID byte
  * decoding, multi-queue union, the capstone) stays in MQSourceSpec.
  */
trait MQTransportContractSuite extends SparkSpec {
  import spark.implicits._

  /** Fresh fixture = fresh empty queue. */
  def fixture(): MQContractFixture

  private def prefix: String =
    getClass.getSimpleName.replaceAll("[^A-Za-z0-9]", "").toLowerCase

  test("contract: depth is a monotone high-water mark across destructive commits (A8)") {
    val f = fixture()
    f.publish((1000L, "a"), (1000L, "b"), (1001L, "c"))
    val t = f.transport()
    assert(t.depth() == 3L)
    t.commit(2L)
    // destructive transports remove messages on commit; depth() must
    // STILL report committed + remaining, never the shrunk browse
    // depth (the trait scaladoc's stall hazard)
    assert(t.depth() == 3L)
    f.publish((1002L, "d"))
    assert(t.depth() == 4L)
  }

  test("contract: reads replay identically until commit removes the range") {
    val f = fixture()
    f.publish((1000L, "a"), (1000L, "b"), (1001L, "c"))
    val t = f.transport()
    def payloads(records: Iterator[graft.sources.mq.MQRecord]) =
      records.map(r => (r.putMillis, r.payload)).toSeq
    val first = payloads(t.read(0L, 3L))
    assert(first == Seq((1000L, "a"), (1000L, "b"), (1001L, "c")))
    // same range, same transport: identical (at-least-once replay)
    assert(payloads(t.read(0L, 3L)) == first)
    // same range, FRESH transport (driver restart): identical
    assert(payloads(f.transport().read(0L, 3L)) == first)
    // after a partial commit the uncommitted suffix still replays at
    // its ABSOLUTE positions
    t.commit(2L)
    assert(payloads(t.read(2L, 3L)) == Seq((1001L, "c")))
    assert(payloads(t.read(2L, 3L)) == Seq((1001L, "c")))
  }

  test("contract: commit is idempotent and monotone") {
    val f = fixture()
    f.publish((1L, "a"), (2L, "b"), (3L, "c"))
    val t = f.transport()
    t.commit(2L)
    t.commit(2L) // replayed ack: no-op
    t.commit(1L) // stale ack: no-op, never un-commits
    assert(t.depth() == 3L)
    assert(t.read(2L, 3L).map(_.payload).toSeq == Seq("c"))
    t.commit(3L)
    assert(t.depth() == 3L)
  }

  test("contract: sameMillisPrefix counts the same-millisecond run before pos (A4 resume)") {
    val f = fixture()
    f.publish((1000L, "a"), (1000L, "b"), (1001L, "c"), (1001L, "d"))
    val t = f.transport()
    assert(t.sameMillisPrefix(0L) == 0)
    assert(t.sameMillisPrefix(1L) == 1)
    assert(t.sameMillisPrefix(2L) == 0)
    assert(t.sameMillisPrefix(3L) == 1)
  }

  test("contract: source reads synthesized keys in queue order (A4)") {
    val f = fixture()
    f.publish((1000L, "m1"), (1000L, "m2"), (1001L, "m3"))
    val rows = spark.read.format("ibmmq").options(f.options).load()
      .orderBy("put_ts", "seq")
      .select("key", "value").as[(String, String)].collect().toSeq
    assert(rows == Seq(("1000_1", "m1"), ("1000_2", "m2"),
      ("1001_1", "m3")))
  }

  test("contract: commit follows the checkpoint; a restarted query never redelivers (A8)") {
    val f = fixture()
    val ckpt = Files.createTempDirectory(s"$prefix-ckpt")
    val out = Files.createTempDirectory(s"$prefix-out")
    def drain(): Unit = {
      // parquet sink: the memory sink cannot recover from a
      // checkpoint, and restart-recovery IS this test
      val q = spark.readStream.format("ibmmq").options(f.options)
        .load()
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    def sunk() = spark.read.parquet(out.toString)
    f.publish((1L, "a"), (2L, "b"), (3L, "c"))
    drain()
    assert(sunk().count() == 3)
    drain() // restart with nothing new: checkpoint holds, no redelivery
    assert(sunk().count() == 3)
    f.publish((4L, "d"))
    drain() // restart continues past the checkpoint
    assert(sunk().select("value").as[String].collect().toSet ==
      Set("a", "b", "c", "d"))
  }

  test("contract: admission control caps each micro-batch (A12)") {
    val f = fixture()
    val ckpt = Files.createTempDirectory(s"$prefix-rate-ckpt")
    f.publish((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
    val sink = s"${prefix}_rate_sink"
    val q = spark.readStream.format("ibmmq").options(f.options)
      .option("maxMessagesPerTrigger", "2")
      .load()
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table(sink).count() == 5)
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    assert(progress.nonEmpty && progress.forall(_.numInputRows <= 2))
  }

  test("contract: halt file pauses consumption until removed (A9)") {
    val f = fixture()
    assume(f.haltFileLocation.isDefined, "fixture has no halt file path")
    val halt = f.haltFileLocation.get
    Files.write(halt, "x".getBytes(StandardCharsets.UTF_8))
    f.publish((1L, "a"))
    val opts = MQOptions(f.options + ("haltFile" -> halt.toString))
    val stream = new graft.sources.mq.MQMicroBatchStream(opts)
    val start = stream.initialOffset()
    val end = stream.latestOffset(start, stream.getDefaultReadLimit)
    assert(end.asInstanceOf[graft.sources.mq.MQOffset].pos == 0L)
    Files.delete(halt)
    val end2 = stream.latestOffset(start, stream.getDefaultReadLimit)
    assert(end2.asInstanceOf[graft.sources.mq.MQOffset].pos == 1L)
  }

  test("contract: GET-inhibited queue stalls the offset until re-enabled (A10)") {
    val f = fixture()
    assume(f.supportsInhibit, "fixture cannot flip GET-inhibited")
    f.publish((1L, "a"))
    f.setInhibited(true)
    val stream = new graft.sources.mq.MQMicroBatchStream(MQOptions(f.options))
    val start = stream.initialOffset()
    val end = stream.latestOffset(start, stream.getDefaultReadLimit)
    assert(end.asInstanceOf[graft.sources.mq.MQOffset].pos == 0L)
    f.setInhibited(false)
    val end2 = stream.latestOffset(start, stream.getDefaultReadLimit)
    assert(end2.asInstanceOf[graft.sources.mq.MQOffset].pos == 1L)
  }

  test("contract: put under a txn id replays as a no-op (write-side exactly-once)") {
    val f = fixture()
    assume(f.supportsPutLedger, "transport has no txn ledger")
    val t = f.transport()
    t.put("txn-1", Seq("x", "y"))
    assert(t.depth() == 2L)
    t.put("txn-1", Seq("x", "y")) // replay after crash: already applied
    assert(t.depth() == 2L)
    t.put("txn-2", Seq("z"))
    assert(t.depth() == 3L)
  }
}

/** The offline instance: every contract behavior proven against
  * [[FileMQTransport]]. The adapter's one-line instantiation is
  * documented in contrib/ibmmq-client/README.md. */
class FileMQTransportContractSpec extends MQTransportContractSuite {
  override def fixture(): MQContractFixture = new MQContractFixture {
    private val dir = Files.createTempDirectory("mq-contract")
    override def options: Map[String, String] =
      Map("path" -> dir.toString)
    override def transport(): MQTransport =
      new FileMQTransport(dir.toString)
    override def publish(records: (Long, String)*): Unit = {
      val text = records.map { case (ms, p) => s"$ms\t$p" }
        .mkString("", "\n", "\n")
      Files.write(dir.resolve("queue.jsonl"),
        text.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
    override def supportsPutLedger: Boolean = true
    override def supportsInhibit: Boolean = true
    override def setInhibited(on: Boolean): Unit =
      if (on) Files.write(dir.resolve("inhibited"), Array.emptyByteArray)
      else Files.deleteIfExists(dir.resolve("inhibited"))
    override def haltFileLocation: Option[Path] =
      Some(dir.resolve("queue.halt"))
  }
}
