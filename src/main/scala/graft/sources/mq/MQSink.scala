package graft.sources.mq

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{StringType, StructType}

/** The write side of the `ibmmq` format: `df.writeStream
  * .format("ibmmq")` PUTs each row's `value` string onto the queue.
  * Completes the source/sink symmetry the reference lacks (the
  * reference is receive-only — IBMMQReceiver.java is a
  * `Receiver<String>`); an engine replacing it needs the reply/forward
  * direction too.
  *
  * Delivery contract — exactly-once onto the queue:
  * Structured Streaming replays an epoch after any failure between
  * writer commit and checkpoint, so the sink keys every epoch's PUT
  * batch with txnId = `<queryId>#<epochId>` and the transport's
  * transactional [[MQTransport.put]] makes re-applying a txnId a
  * no-op (real client: syncpoint unit of work; file fake: txn
  * ledger). Net effect: at-least-once epochs from Spark x idempotent
  * transactional put = exactly-once messages.
  *
  * Ordering: executors buffer rows per task; the DRIVER performs the
  * single PUT per epoch, with partitions concatenated in partition-id
  * order. An MQ queue is one FIFO — parallel putters would interleave
  * nondeterministically, the exact failure mode the reference's
  * one-receiver deployment exists to avoid (README.md:59-64), so the
  * funnel-through-one-putter is the semantics, not a shortcut. The
  * per-epoch buffer is bounded by the micro-batch size (tune with the
  * upstream trigger/admission limits); queue traffic is
  * message-scale, not corpus-scale. Scale-out = many queues, one sink
  * each — same stance as the source.
  */
object MQSink {
  /** Rows must carry a string `value` column (Kafka-sink convention). */
  def valueIndex(schema: StructType): Int = {
    val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase("value"))
    require(i >= 0 && schema.fields(i).dataType == StringType,
      s"ibmmq sink requires a STRING 'value' column, got ${schema.simpleString}")
    i
  }
}

class MQWriteBuilder(options: MQOptions, info: LogicalWriteInfo)
  extends WriteBuilder {
  // validate the schema at plan time, not first-epoch time
  private val valueIdx = MQSink.valueIndex(info.schema())

  override def build(): Write = new Write {
    override def toStreaming: StreamingWrite =
      new MQStreamingWrite(options, info.queryId(), valueIdx)
  }
}

class MQStreamingWrite(options: MQOptions, queryId: String, valueIdx: Int)
  extends StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
  : StreamingDataWriterFactory = new MQWriterFactory(valueIdx)

  /** Driver-side transactional PUT of the whole epoch, partitions in
    * id order (task order within a partition is preserved by the
    * writer's buffer). Idempotent under epoch replay via the txnId. */
  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val payloads = messages.iterator
      .map { case m: MQWriteMessage => m }
      .toSeq.sortBy(_.partitionId)
      .flatMap(_.payloads)
    options.transport().put(s"$queryId#$epochId", payloads)
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = ()
}

case class MQWriteMessage(partitionId: Int, payloads: Seq[String])
  extends WriterCommitMessage

class MQWriterFactory(valueIdx: Int) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new MQDataWriter(partitionId, valueIdx)
}

/** Buffers the task's payloads; the actual queue PUT happens in the
  * driver-side epoch commit (see [[MQStreamingWrite]]). */
class MQDataWriter(partitionId: Int, valueIdx: Int)
  extends DataWriter[InternalRow] {
  private val buf = Vector.newBuilder[String]

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(valueIdx), "ibmmq sink: null value")
    buf += row.getUTF8String(valueIdx).toString
  }

  override def commit(): WriterCommitMessage =
    MQWriteMessage(partitionId, buf.result())

  override def abort(): Unit = ()
  override def close(): Unit = ()
}
