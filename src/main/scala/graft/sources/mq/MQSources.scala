package graft.sources.mq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Horizontal scale for the MQ source.
  *
  * One `ibmmq` stream is deliberately ONE ordered partition — the
  * reference exists to preserve queue order (README.md:59-64), and
  * splitting a FIFO queue across readers would break exactly the
  * contract it replicates. Scale at 100 TB therefore comes from MANY
  * queues (the standard MQ deployment shape: one queue per shard /
  * region / replication stream), each its own source with its own
  * offsets, checkpoint lineage, and admission control, unioned into
  * one DataFrame downstream.
  *
  * Order guarantee after the union: per-queue order is preserved
  * (each source stays a single ordered partition end-to-end); there
  * is no global cross-queue order — consumers that need one sort by
  * (`put_ts`, `seq`) within a watermark, same as any multi-shard log.
  */
object MQSources {

  /** Union of one `ibmmq` stream per queue directory/name, tagged with
    * the queue it came from. `options` apply to every member (rate
    * caps, retry policy, ccsid, ...).
    */
  def unionQueues(spark: SparkSession, queues: Seq[String],
                  options: Map[String, String] = Map.empty): DataFrame = {
    require(queues.nonEmpty, "need at least one queue")
    queues.map { q =>
      options.foldLeft(spark.readStream.format("ibmmq")) {
        case (r, (k, v)) => r.option(k, v)
      }.option("path", q).load()
        .withColumn("queue", lit(q))
    }.reduce(_ unionByName _)
  }
}
