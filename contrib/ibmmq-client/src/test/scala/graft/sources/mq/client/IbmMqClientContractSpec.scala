package graft.sources.mq.client

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import com.ibm.mq.MQException
import com.ibm.mq.constants.CMQC

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.mq.RetryingTransport

/** Broker-less contract check of the real-client adapter, compiled
  * only in stub mode (`sbt -Dgraft.mqstub=true test`) against the
  * shape-only public-API stubs in contrib/mq-api-stubs. What a
  * compile-check CAN prove without a broker: the adapter links
  * against the public client API, defers all connection work past
  * construction (Spark task serialization requires that), fails
  * CLEANLY at connect time with a typed MQException, and inherits the
  * A13 retry/backoff wrapper unchanged. Every behavioral A1–A15
  * contract is the transport-parameterized suite in
  * src/test/scala/graft/sources/mq/MQTransportContract.scala — the
  * adapter runs it the day the real jar exists.
  */
class IbmMqClientContractSpec extends AnyFunSuite {

  private def transport() = new IbmMqClientTransport(
    host = "localhost", port = 1414, queueManager = "QM1",
    channel = "DEV.APP.SVRCONN", queue = "DEV.QUEUE.1",
    user = Some("app"), password = Some("pw"),
    sslCipherSuite = None, ccsid = Some(1208))

  test("construction is connection-free; first use fails cleanly with a typed MQException") {
    val t = transport() // must NOT throw: handles are @transient lazy
    val e = intercept[MQException](t.depth())
    assert(e.reasonCode == CMQC.MQRC_HOST_NOT_AVAILABLE)
    // every entry point hits the same clean connect failure, never a
    // half-connected state
    assert(intercept[MQException](t.read(0L, 1L)).reasonCode ==
      CMQC.MQRC_HOST_NOT_AVAILABLE)
    assert(intercept[MQException](t.commit(1L)).reasonCode ==
      CMQC.MQRC_HOST_NOT_AVAILABLE)
    assert(intercept[MQException](t.put("txn-1", Seq("m"))).reasonCode ==
      CMQC.MQRC_HOST_NOT_AVAILABLE)
  }

  test("RetryingTransport wraps the adapter unchanged (A13 inherited)") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val r = new RetryingTransport(transport(), maxAttempts = 3,
      initialBackoffMs = 10L, maxBackoffMs = 40L, sleep = sleeps += _)
    val e = intercept[MQException](r.depth())
    assert(e.reasonCode == CMQC.MQRC_HOST_NOT_AVAILABLE)
    assert(sleeps.toSeq == Seq(10L, 20L)) // 2 backoffs between 3 attempts
  }

  test("survives Spark task serialization (Serializable; lazy handles re-open per JVM)") {
    val bytes = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bytes)
    out.writeObject(transport())
    out.close()
    val in = new ObjectInputStream(new ByteArrayInputStream(bytes.toByteArray))
    val copy = in.readObject().asInstanceOf[IbmMqClientTransport]
    assert(intercept[MQException](copy.depth()).reasonCode ==
      CMQC.MQRC_HOST_NOT_AVAILABLE)
  }
}
