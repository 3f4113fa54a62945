package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct alongside
  * (`modality`, `n_bytes`, `content_hash`). Decode / feature-extract
  * run per-partition over iterators (the Scala analogue of a batched
  * Pandas UDF: one JVM call per partition, streaming through rows, no
  * per-row lambda dispatch, bounded memory).
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container): `fakeDecode` derives deterministic pseudo-features from
  * the bytes. The Spark-side contract — schema, batch iteration,
  * partition sizing — is real and tested (MultimodalSpec).
  *
  * Scale note: payloads at 100 TB dominate row size, so ops that don't
  * need the bytes must prune the column (columnar parquet reads make
  * that free) — metadata-only queries never touch the blob. Feature
  * extraction repartitions by size-balanced ranges, not by count, when
  * blob sizes are skewed.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** Attach the binary payload + typed metadata to a text corpus (the
    * test fixture treats utf-8 text bytes as the "media"; a real corpus
    * arrives with the blob column already populated). */
  def withPayload(docs: DataFrame, idCol: String, textCol: String,
                  modality: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit(modality).as("modality"),
        octet_length(encode(col(textCol), "UTF-8")).as("n_bytes"),
        sha2(encode(col(textCol), "UTF-8"), 256).as("content_hash")
      ).as("meta"))

  /** Deterministic fake decoder standing in for a real image decode:
    * derives (width, height, 8-dim feature) purely from the bytes. */
  private[operators] def fakeDecode(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = bytes.length
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    val feat = new Array[Float](8)
    var i = 0
    while (i < n) {
      feat(i % 8) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    (width, height, feat)
  }

  /** Video-frame-sampling shape: split each payload into fixed-size
    * "frames" and emit up to `maxFrames` of them, evenly strided —
    * exactly the batch topology of real frame sampling (one row in,
    * few rows out, bytes only touched per-partition). */
  def frameSample(withBlobs: DataFrame, frameBytes: Int,
                  maxFrames: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    withBlobs.select(col("doc_id"), col("payload"))
      .flatMap { r =>
        val id = r.getAs[Long]("doc_id")
        val bytes = r.getAs[Array[Byte]]("payload")
        val nFrames = math.max(1, bytes.length / frameBytes)
        // endpoint-inclusive index interpolation rather than a fixed
        // stride: a ceiling stride covers the tail but can undershoot
        // the frame budget (nFrames=5, maxFrames=4 → 3 frames); the
        // interpolated picks always yield min(nFrames, maxFrames)
        // distinct frames, first and last frame included
        val k = math.min(nFrames, maxFrames)
        (0 until k)
          .map(f => if (k == 1) 0
                    else (f.toLong * (nFrames - 1) / (k - 1)).toInt)
          .map { f =>
          val from = f * frameBytes
          val until = math.min(bytes.length, from + frameBytes)
          Row(id, f, java.util.Arrays.copyOfRange(bytes, from, until))
        }
      }(enc)
  }

  /** "Resize" stage: recompute target dimensions per payload — the
    * image-resize batch shape with the pixel work stubbed (no image
    * libs in this container; a real impl swaps fakeDecode for a codec
    * call, the Spark plumbing is identical). */
  def resizeMeta(withBlobs: DataFrame, maxSide: Int): DataFrame =
    extractFeatures(withBlobs.sparkSession, withBlobs)
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))))
      .withColumn("out_w", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", ceil(col("height") * col("scale")).cast("int"))
      .select(col("doc_id"), col("width"), col("height"),
        col("out_w"), col("out_h"))

  /** 64-bit perceptual hash of a binary payload column (aHash over
    * the deterministic decoded grid — HashKernels.phash64): native
    * codegen expression, one pass per row, no UDF boundary. */
  def perceptualHash(payload: org.apache.spark.sql.Column)
  : org.apache.spark.sql.Column = {
    graft.functions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_phash64", payload)
  }

  /** Near-duplicate PAYLOAD pairs — dedup for the binary modality
    * column, closing the text/embedding/payload triangle: perceptual
    * hash per blob (map-only, codegen), then the SAME 4×16-bit banded
    * hamming join the text simhash path uses
    * ([[Dedup.hammingNearDupsBanded]] — complete for hamming <= 3 by
    * pigeonhole, candidate generation beyond, hot buckets capped).
    * The payload bytes are read ONCE: the narrow (doc, phash) frame is
    * `localCheckpoint`ed (eager — materializes the hash pass at
    * CONSTRUCTION time, a deliberate trade: lazy checkpointing only
    * persists after the first job finishes, so a one-shot query's
    * three consumer stages would still re-hash the blobs within that
    * job; the cost is that building the DataFrame without executing it
    * runs the hash pass, and plan dumps bottom out at the checkpoint
    * RDD. No cache-manager residue; executor blocks are freed by the
    * ContextCleaner when the result's reference dies, the
    * connectedComponents stance), so the banded join's three consumers
    * (census + both self-join sides) replay 16-byte rows instead of
    * re-hashing blobs — at 100 TB the payload column dominates row
    * size and a triple re-hash would dominate the query. The join
    * itself runs entirely on (id, 64-bit) rows, so blob size never
    * enters the shuffle. Output: (doc_a, doc_b, hamming).
    */
  def payloadNearDups(withBlobs: DataFrame, idCol: String,
                      payloadCol: String, maxHamming: Int,
                      bucketCap: Int = 10000): DataFrame =
    Dedup.hammingNearDupsBanded(
      withBlobs.select(col(idCol).as("doc"),
        perceptualHash(col(payloadCol)).as("phash"))
        .localCheckpoint(),
      "doc", "phash", maxHamming, bucketCap, persistIndex = false)

  /** Batched per-partition feature extraction over the payload column —
    * the mapInPandas-shaped stage. Input must have doc_id, payload,
    * meta.modality. */
  def extractFeatures(spark: SparkSession, withBlobs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    withBlobs
      .select(col("doc_id"), col("payload"), col("meta.modality").as("modality"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getAs[Long]("doc_id")
          val bytes = r.getAs[Array[Byte]]("payload")
          val modality = r.getAs[String]("modality")
          val (w, h, feat) = fakeDecode(bytes)
          Row(id, modality, bytes.length, w, h, feat.toSeq)
        }
      }(enc)
  }
}
