package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary payload plumbing + batched fake decode") {
    val docs = Seq((0L, "hello"), (1L, "a longer document body"))
      .toDF("doc_id", "text")
    val withBlobs = Multimodal.withPayload(docs, "doc_id", "text", "image")
    assert(withBlobs.schema("payload").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(spark, withBlobs)
    val rows = feats.orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Int]("n_bytes") == 5)
    assert(rows(0).getAs[String]("modality") == "image")
    assert(rows(0).getSeq[Float](5).length == 8)
    // deterministic: same bytes → same features
    val again = Multimodal.extractFeatures(spark, withBlobs)
      .orderBy("doc_id").collect()
    assert(rows.map(_.getSeq[Float](5).toList).toSeq ==
      again.map(_.getSeq[Float](5).toList).toSeq)
  }

  test("frame sampling strides fixed-size frames per payload") {
    val docs = Seq((0L, "x" * 100)).toDF("doc_id", "text")
    val frames = Multimodal.frameSample(
        Multimodal.withPayload(docs, "doc_id", "text", "video"),
        frameBytes = 10, maxFrames = 4)
      .orderBy("frame_idx").collect()
    assert(frames.length == 4)
    // endpoint-inclusive interpolation spans the WHOLE payload
    // (10 frames / max 4 → 0,3,6,9 — first and last frame included);
    // a floor stride sampled only 0,2,4,6 and never saw the tail
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 10))
    // the budget is filled whenever nFrames >= maxFrames: the old
    // ceiling stride gave only 3 frames for nFrames=5, maxFrames=4
    val five = Multimodal.frameSample(
        Multimodal.withPayload(Seq((1L, "y" * 50)).toDF("doc_id", "text"),
          "doc_id", "text", "video"),
        frameBytes = 10, maxFrames = 4)
      .orderBy("frame_idx").collect()
    assert(five.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1, 2, 4))
  }

  test("resize meta scales dims down to max side") {
    val docs = Seq((0L, "y" * 300)).toDF("doc_id", "text")
    val r = Multimodal.resizeMeta(
      Multimodal.withPayload(docs, "doc_id", "text", "image"), maxSide = 16)
      .collect().head
    assert(math.max(r.getAs[Int]("out_w"), r.getAs[Int]("out_h")) <= 16)
    assert(r.getAs[Int]("out_w") > 0 && r.getAs[Int]("out_h") > 0)
  }

  test("perceptual hash: local edits stay hamming-close, others far") {
    // kernel-level contract first: flipping a couple of bytes moves
    // few grid cells, so the hash stays hamming-close; unrelated
    // payloads disagree on many bits
    import graft.functions.HashKernels.phash64
    val base = Array.tabulate[Byte](512)(i => ((i * 37 + 11) % 251).toByte)
    val tweaked = base.clone()
    tweaked(100) = (tweaked(100) ^ 0x7f).toByte
    tweaked(400) = (tweaked(400) ^ 0x55).toByte
    val other = Array.tabulate[Byte](512)(i => ((i * i + 97) % 241).toByte)
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(phash64(base) == phash64(base.clone())) // deterministic
    assert(hamming(phash64(base), phash64(tweaked)) <= 6,
      s"local edit moved ${hamming(phash64(base), phash64(tweaked))} bits")
    assert(hamming(phash64(base), phash64(other)) > 12,
      s"unrelated payloads only ${hamming(phash64(base), phash64(other))} apart")
    assert(phash64(Array.emptyByteArray) == 0L)

    // operator-level: near-identical payloads pair through the banded
    // join, distinct ones don't; payload bytes never join anything
    val rows = Seq(
      (0L, new String(base.map(b => (40 + ((b & 0xff) % 50)).toChar))),
      (1L, new String(tweaked.map(b => (40 + ((b & 0xff) % 50)).toChar))),
      (2L, new String(other.map(b => (40 + ((b & 0xff) % 50)).toChar))))
      .toDF("doc_id", "text")
    val blobs = Multimodal.withPayload(rows, "doc_id", "text", "image")
    val pairs = Multimodal.payloadNearDups(blobs, "doc_id", "payload",
        maxHamming = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"near-identical payloads missed: $pairs")
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)),
      s"unrelated payloads paired: $pairs")
  }
}
