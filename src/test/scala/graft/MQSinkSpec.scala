package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import graft.sources.mq.{FileMQTransport, MQTransport, RetryingTransport}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** The write side of the `ibmmq` format: transactional idempotent put
  * through the transport seam, exactly-once under epoch replay, FIFO
  * order through the single driver-side putter, and source⇄sink
  * round-trip.
  */
class MQSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): Path =
    Files.createTempDirectory(prefix)

  private def queued(dir: Path): Seq[String] =
    if (Files.exists(dir.resolve("queue.jsonl")))
      new String(Files.readAllBytes(dir.resolve("queue.jsonl")),
        StandardCharsets.UTF_8)
        .split("\n", -1).toSeq.filter(_.nonEmpty)
        .map(_.split("\t", 2)(1))
    else Seq.empty

  test("transport put is transactional and idempotent by txnId") {
    val dir = tmpDir("mq-put")
    val t = new FileMQTransport(dir.toString, clock = () => 1234L)
    t.put("q#0", Seq("a", "b"))
    t.put("q#0", Seq("a", "b")) // epoch replay: no-op
    t.put("q#1", Seq("c"))
    t.put("q#2", Seq.empty)     // empty epoch still ledgered
    t.put("q#2", Seq("would-dup"))
    assert(queued(dir) == Seq("a", "b", "c"))
    assert(t.txnApplied("q#0") && t.txnApplied("q#2"))
    assert(!t.txnApplied("q#3"))
    // reads see the put messages with the injected put time
    assert(t.read(0, 3).map(r => (r.putMillis, r.payload)).toSeq ==
      Seq((1234L, "a"), (1234L, "b"), (1234L, "c")))
  }

  test("retrying transport makes flaky puts exactly-once") {
    val dir = tmpDir("mq-put-retry")
    val inner = new FileMQTransport(dir.toString)
    var failuresLeft = 2
    val flaky = new MQTransport {
      override def depth(): Long = inner.depth()
      override def read(s: Long, e: Long): Iterator[graft.sources.mq.MQRecord] =
        inner.read(s, e)
      override def commit(upTo: Long): Unit = inner.commit(upTo)
      override def sameMillisPrefix(pos: Long): Int = inner.sameMillisPrefix(pos)
      override def put(txnId: String, payloads: Seq[String]): Unit = {
        inner.put(txnId, payloads) // applied...
        if (failuresLeft > 0) { failuresLeft -= 1; sys.error("boom") } // ...then "lost" ack
      }
    }
    val retrying = new RetryingTransport(flaky, maxAttempts = 5,
      initialBackoffMs = 1, maxBackoffMs = 2, sleep = _ => ())
    retrying.put("e#7", Seq("x", "y"))
    // applied once despite two post-apply failures + retries
    assert(queued(dir) == Seq("x", "y"))
  }

  test("writeStream format(ibmmq) puts values in order, exactly once") {
    val dir = tmpDir("mq-sink")
    val ckpt = tmpDir("mq-sink-ckpt").toString
    val in = MemoryStream[String](spark)
    in.addData("m1", "m2", "m3")
    def run(): Unit = {
      val q = in.toDF().writeStream.format("ibmmq")
        .option("path", dir.toString)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    run()
    assert(queued(dir) == Seq("m1", "m2", "m3"))
    // restart from the SAME checkpoint: committed batches are not
    // re-put (and a replayed epoch would hit the txn ledger anyway)
    run()
    assert(queued(dir) == Seq("m1", "m2", "m3"))
  }

  test("sink to source round-trip preserves payloads and order") {
    val dir = tmpDir("mq-roundtrip")
    val in = MemoryStream[String](spark)
    in.addData("r1", "r2", "r3", "r4")
    val q = in.toDF().writeStream.format("ibmmq")
      .option("path", dir.toString)
      .option("checkpointLocation", tmpDir("mq-rt-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val back = spark.read.format("ibmmq")
      .option("path", dir.toString).load()
      .orderBy("put_ts", "seq")
      .select("value").as[String].collect().toSeq
    assert(back == Seq("r1", "r2", "r3", "r4"))
  }

  test("MQ→transform→MQ: full pipeline is exactly-once on both edges") {
    // queue A (pre-loaded) → ibmmq source → uppercase transform →
    // ibmmq sink → queue B; the reply/forward topology the reference's
    // receive-only design can't express.
    val a = tmpDir("mq-pipe-a")
    val b = tmpDir("mq-pipe-b")
    val ckpt = tmpDir("mq-pipe-ckpt").toString
    Files.write(a.resolve("queue.jsonl"),
      "1000\talpha\n1000\tbeta\n1001\tgamma\n".getBytes(StandardCharsets.UTF_8))
    def run(): Unit = {
      val q = spark.readStream.format("ibmmq")
        .option("path", a.toString).load()
        .selectExpr("upper(value) AS value")
        .writeStream.format("ibmmq")
        .option("path", b.toString)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    run()
    assert(queued(b) == Seq("ALPHA", "BETA", "GAMMA"))
    // restart: source resumes at its checkpointed offset, sink txns
    // are ledgered — nothing is re-delivered on either edge
    run()
    assert(queued(b) == Seq("ALPHA", "BETA", "GAMMA"))
    // new upstream messages flow through incrementally
    Files.write(a.resolve("queue.jsonl"),
      "1002\tdelta\n".getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.APPEND)
    run()
    assert(queued(b) == Seq("ALPHA", "BETA", "GAMMA", "DELTA"))
  }

  test("schema is validated at plan time: value column required") {
    val dir = tmpDir("mq-sink-bad")
    val in = MemoryStream[Int](spark)
    in.addData(1)
    val err = intercept[Exception] {
      val q = in.toDF().withColumnRenamed("value", "not_value")
        .writeStream.format("ibmmq")
        .option("path", dir.toString)
        .option("checkpointLocation", tmpDir("mq-bad-ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    assert(err.getMessage != null)
    assert(queued(dir).isEmpty)
  }
}
