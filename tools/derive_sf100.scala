// Third decade of scale evidence (round 16): derive a 10,000x-the-
// gate corpus (/tmp/sf100d, ~5M docs / 2M vecs) as 10 near-dup copies
// of the derived sf10 corpus — extending the sf0.1 -> sf1d -> sf10d
// geometric ladder to 1x/10x/100x/1000x. At this rung the re-trained
// IVF coarse quantizer sizes to √2M ≈ 1414 centroid directories and
// the LSH bucket count holds, so the DPP-layout and bucket-skew
// claims are stressed an order past sf10d. Only the tables the scale
// checkpoints read are derived: documents + embeddings (ServingBench
// dense rows, door parity) and the fixed region/nation dimensions
// (bench warmup). Prereq: tools/derive_sf1.scala then
// tools/derive_sf10.scala. Run:
//   /opt/spark/bin/spark-shell --master local[16] --driver-memory 16g \
//     --conf spark.ui.enabled=false -I tools/derive_sf100.scala <<< ""
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
val src = "/tmp/sf10d"
val out = "/tmp/sf100d"
require(new java.io.File(src, "documents.parquet").exists,
  s"derive sf10 first (tools/derive_sf10.scala -> $src)")
val docs = spark.read.parquet(s"$src/documents.parquet")
val nD = docs.agg(max("doc_id")).first().getLong(0) + 1L
val d10 = (0 until 10).map { k =>
  docs.select(
    (col("doc_id") + lit(k * nD)).as("doc_id"),
    // per-copy suffix token (distinct from derive_sf1's " v$k" and
    // derive_sf10's " w$k") keeps copies NEAR-dups of both their
    // sf10d original and each other, so dedup-family work scales
    // like a real 10x corpus again
    concat(col("text"), lit(s" x$k")).as("text"),
    col("lang"), col("source"), (col("n_chars") + lit(3L)).as("n_chars"))
}.reduce(_ unionByName _)
d10.coalesce(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
val emb = spark.read.parquet(s"$src/embeddings.parquet")
val nE = emb.agg(max("vec_id")).first().getLong(0) + 1L
val e10 = (0 until 10).map { k =>
  emb.select(
    (col("vec_id") + lit(k * nE)).as("vec_id"),
    // perturb a THIRD axis (dim 2; derive_sf1 used dim 0, derive_sf10
    // dim 1) by a still-smaller step, so sf100d copies cluster near
    // their sf10d parents without collapsing to exact duplicates
    transform(col("embedding"), (x, i) =>
      when(i === 2, x + lit(k.toFloat * 0.0025f)).otherwise(x))
      .as("embedding"),
    col("label"))
}.reduce(_ unionByName _)
e10.coalesce(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
spark.read.parquet(s"$src/region.parquet").coalesce(1)
  .write.mode("overwrite").parquet(s"$out/region.parquet")
spark.read.parquet(s"$src/nation.parquet").coalesce(1)
  .write.mode("overwrite").parquet(s"$out/nation.parquet")
println("DERIVED " +
  spark.read.parquet(s"$out/documents.parquet").count() + " docs, " +
  spark.read.parquet(s"$out/embeddings.parquet").count() + " vecs")
System.exit(0)
