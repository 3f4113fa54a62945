// Streaming ingest-door throughput evidence (VERDICT r9 item 3).
// Run:  /opt/spark/bin/spark-shell --master local[32] --driver-memory 8g \
//         --jars target/scala-2.13/sparkibmmqspark_2.13-0.1.0.jar \
//         --conf spark.ui.enabled=false \
//         --conf spark.sql.shuffle.partitions=32 \
//         -I tools/ingest_bench.scala <<< ""
// Measures sustained docs/s of the format("ibmmq") -> 5-gate ingestDoor
// pipeline over the sf0.1 corpus indexes, with a cumulative per-gate
// cost breakdown (each stage adds one gate in door order; the delta
// between consecutive stages is that gate's cost). Results go to
// docs/SCALE.md. Protocol notes:
//  - one JVM, stages run back-to-back; each stage is run REPS times
//    on fresh checkpoints (full reprocess) and the FASTEST rep is
//    reported, which discounts first-rep codegen compile of each
//    stage's distinct plan (the bench-protocol note in SCALE.md).
//  - arrivals: ARRIVALS messages (default 30k) = per corpus doc, one
//    exact duplicate + five near/semantic variants, shuffled, put_ts
//    strictly increasing; BATCH (default 10k) caps each micro-batch.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.operators.{Decontaminate, Dedup, Dsir, Similarity, TextAnalysis => TA}
import graft.streaming.StreamingOps

val ARRIVALS = sys.env.getOrElse("ARRIVALS", "30000").toInt
val BATCH = sys.env.getOrElse("BATCH", "10000").toInt
val REPS = sys.env.getOrElse("REPS", "2").toInt
val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

val docs = graft.Tables.load(spark, sf, "documents")
val nCorpus = docs.count()

// ---- corpus-side state (index build time is NOT ingest time) ----
spark.sql("DROP TABLE IF EXISTS ib_dig")
spark.sql("DROP TABLE IF EXISTS ib_band")
Dedup.createDigestIndexTable(docs, "text", "ib_dig", 32)
Dedup.createBandedIndexTable(
  docs.select(col("doc_id"), StreamingOps.doorFingerprint(col("text")).as("fp")),
  "doc_id", "fp", "ib_band", 32)
val bloom = Decontaminate.buildShingleBloom(
  docs.withColumn("is_eval", col("doc_id") % 11 === 0),
  "doc_id", "text", col("is_eval"), n = 3)
val dsir = Dsir.fitModel(
  docs.limit(2000).withColumn("is_t", col("doc_id") % 2 === 0),
  "doc_id", TA.tokens(col("text")), isTarget = col("is_t"))
// deterministic hash-derived 8-dim "embedding" of the 2-token prefix
// (the capstone's featurizer): variants sharing a prefix are semantic
// twins only the fifth gate can see
def embedOf(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
  val prefix = concat_ws(" ", slice(TA.tokens(text), 1, 2))
  transform(sequence(lit(0), lit(7)), i =>
    (pmod(xxhash64(concat_ws("_", prefix, i.cast("string"))),
      lit(2000L)).cast("double") - 1000.0d) / 1000.0d)
}
// scale-correct coarse quantizer: nCentroids tracks sqrt(corpus) so
// the semantic gate's per-arrival probe stays O(sqrt N) — a frozen 16
// at sf1 made the gate ~17x more expensive (measured, SCALE.md r10)
val CENTROIDS = (sys.env.get("CENTROIDS").map(_.toInt)
  .getOrElse(Similarity.suggestedNCentroids(nCorpus)))
println(s"CENTROIDS: $CENTROIDS (corpus $nCorpus)")
val ivf = Similarity.ivfIndex(
  docs.select(col("doc_id").as("vec_id"), embedOf(col("text")).as("embedding")),
  "vec_id", "embedding", nCentroids = CENTROIDS, persistIndex = true)

// ---- arrival queue: exact dups + near/semantic variants ----
val qdir = java.nio.file.Files.createTempDirectory("ingest-bench")
// note: top-level chains are paren-wrapped — spark-shell -I does not
// continue statements across lines starting with "."
// per corpus doc: 1 exact dup, 3 near/semantic variants (share the
// doc's opening tokens -> fingerprint- or prefix-caught), 2 NOVEL
// docs with unique openings (pass every dedup gate) — so the full
// door has real survivors and every gate has real work
val arrivalsDf = (docs.select(col("doc_id"), col("text"))
  .crossJoin(spark.range(6).toDF("variant"))
  .select(col("doc_id"), col("variant"),
    when(col("variant") === 0, col("text"))
      .when(col("variant") < 4,
        concat(col("text"), lit(" variant token "), col("variant")))
      .otherwise(concat(
        lit("novel"), col("doc_id"), lit("v"), col("variant"),
        lit(" opening "), reverse(col("text")))).as("msg"))
  .orderBy(xxhash64(col("doc_id"), col("variant")))
  .limit(ARRIVALS))
val msgs = arrivalsDf.select("msg").as[String](org.apache.spark.sql.Encoders.STRING).collect()
val base = 1700000000000L
val sb = new StringBuilder
msgs.zipWithIndex.foreach { case (m, i) => sb.append(base + i).append('\t').append(m).append('\n') }
java.nio.file.Files.write(qdir.resolve("queue.jsonl"),
  sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
println(s"QUEUE: ${msgs.length} messages at $qdir (corpus $nCorpus docs)")

// quality score: the q_text_quality_model shape (integer Q8 linear model)
def scoreQ8Of(textCol: String): org.apache.spark.sql.Column = {
  val stopwords = Seq("the", "a", "of", "and", "to")
  val toks = TA.tokens(col(textCol))
  def q4(x: org.apache.spark.sql.Column) = (x * 10000).cast("long")
  val g2 = TA.shingles(toks, 2)
  val stopQ4 = q4(TA.stopwordRatio(toks, stopwords))
  val repQ4 = q4(when(size(g2) === 0, lit(0.0d))
    .otherwise(lit(1.0d) - size(array_distinct(g2)).cast("double") / size(g2).cast("double")))
  val lenSatQ4 = q4(least(size(toks), lit(100)).cast("double") / 100.0d)
  val shortQ4 = when(size(toks) < 20, lit(10000L)).otherwise(lit(0L))
  TA.linearModelQ8(Seq((stopQ4, 8000L), (repQ4, -12000L),
    (lenSatQ4, 6000L), (shortQ4, -5000L)), biasQ8 = 20000000L)
}

def srcStream(): DataFrame =
  (spark.readStream.format("ibmmq").option("path", qdir.toString)
    .option("maxMessagesPerTrigger", BATCH.toString).load()
    .withColumn("embedding", embedOf(col("value"))))

// Cumulative stages in door order. Stages 1-3 stack the PUBLIC
// per-gate combinators (stage 3's dedupAgainstCorpus carries the one
// watermark a plan may own — stacking nearDupAgainstCorpus on top
// would redefine it, so the banded and semantic gates enter through
// the COMPOSED door, whose whole point is spending a single stateful
// op for all gates). Deltas between consecutive stages are that
// gate's cost; stage 5 is the production door and the headline
// number.
val lateness = "10 minutes"
def s1(s: DataFrame) = StreamingOps.dsirAdmitAtDoor(s, "value", dsir)
def s2(s: DataFrame) = StreamingOps.admitAtDoor(s1(s), "value",
  scoreQ8Of("value"), 0L, bloom)
def s3(s: DataFrame) = StreamingOps.dedupAgainstCorpus(s2(s), "value",
  "put_ts", spark.table("ib_dig"), lateness)
def doorWith(s: DataFrame,
             sem: Option[graft.operators.Similarity.IvfIndex],
             hier: Option[graft.operators.Similarity.TwoLevelQuantizer]
               = None) =
  StreamingOps.ingestDoor(s, "value", "put_ts", scoreQ8Of("value"), 0L,
    bloom, dsir, spark.table("ib_dig"), spark.table("ib_band"),
    lateness = lateness, semIndex = sem, semHier = hier,
    semWProbe = 2)
// the hierarchy over the SAME index: stage 6 measures the per-arrival
// rank-kernel delta (flat O(K·dim) scan vs two-level O(wProbe·√K·dim)
// routing) at the sf's √N-sized K — the EXTREME-K dial, here measured
// at K in the hundreds where the flat scan is still affordable
val tlq = graft.operators.Similarity.twoLevelQuantizer(ivf.cents)
println(s"TLQ: ${tlq.supers.size} supers over ${tlq.nCentroids} leaves")
val stages: Seq[(String, DataFrame => DataFrame)] = Seq(
  ("0 source only", (s: DataFrame) => s),
  ("1 +dsir gate", s1 _),
  ("2 +quality+decontam", s2 _),
  ("3 +exact corpus dedup", s3 _),
  ("4 door minus semantic (adds banded near-dup)",
    (s: DataFrame) => doorWith(s, None)),
  ("5 full door (adds semantic probe)",
    (s: DataFrame) => doorWith(s, Some(ivf))),
  ("6 full door, two-level semantic gate",
    (s: DataFrame) => doorWith(s, Some(ivf), Some(tlq))))

case class StageResult(name: String, secs: Double, admitted: Long,
                       batches: Int)
val results = stages.map { case (name, f) =>
  var best = Double.MaxValue
  var admitted = 0L
  var batches = 0
  for (_ <- 1 to REPS) {
    val ckpt = java.nio.file.Files.createTempDirectory("ib-ckpt")
    val out = java.nio.file.Files.createTempDirectory("ib-out")
    val t0 = System.nanoTime
    val q = f(srcStream())
      .select(col("key"), col("value"))
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(600000)
    val secs = (System.nanoTime - t0) / 1e9
    admitted = spark.read.parquet(out.toString).count()
    batches = q.recentProgress.count(_.numInputRows > 0)
    if (secs < best) best = secs
  }
  val r = StageResult(name, best, admitted, batches)
  println(f"STAGE ${r.name}%-28s ${r.secs}%7.2f s  ${msgs.length / r.secs}%9.0f docs/s  admitted=${r.admitted}  batches=${r.batches}")
  r
}
println("BREAKDOWN (delta over previous stage):")
results.sliding(2).foreach { case Seq(a, b) =>
  println(f"  ${b.name}%-28s +${b.secs - a.secs}%6.2f s") }
println(s"DONE arrivals=${msgs.length} batchCap=$BATCH reps=$REPS sf=$sf")
spark.sql("DROP TABLE IF EXISTS ib_dig")
spark.sql("DROP TABLE IF EXISTS ib_band")
