// Second decade of scale evidence (round 16, VERDICT r15 item 3):
// derive a 1000x-the-gate corpus (/tmp/sf10d) as 10 near-dup copies
// of the derived sf1 corpus — the same construction derive_sf1.scala
// applies to sf0.1, so the three checkpoints (sf0.1 -> sf1d -> sf10d)
// form a true 1x/10x/100x geometric ladder for the serving/door
// numbers. Only the tables the scale checkpoint reads are derived:
// documents + embeddings (ServingBench, door parity) and the fixed
// region/nation dimensions (bench warmup). Prereq:
//   /opt/spark/bin/spark-shell --master local[16] --driver-memory 8g \
//     --conf spark.ui.enabled=false -I tools/derive_sf1.scala <<< ""
// Then:
//   /opt/spark/bin/spark-shell --master local[16] --driver-memory 16g \
//     --conf spark.ui.enabled=false -I tools/derive_sf10.scala <<< ""
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
val src = "/tmp/sf1d"
val out = "/tmp/sf10d"
require(new java.io.File(src, "documents.parquet").exists,
  s"derive sf1 first (tools/derive_sf1.scala -> $src)")
val docs = spark.read.parquet(s"$src/documents.parquet")
val nD = docs.agg(max("doc_id")).first().getLong(0) + 1L
val d10 = (0 until 10).map { k =>
  docs.select(
    (col("doc_id") + lit(k * nD)).as("doc_id"),
    // per-copy suffix token (distinct from derive_sf1's " v$k") keeps
    // copies NEAR-dups of BOTH their sf1d original and each other, so
    // dedup-family work scales like a real 10x corpus again
    concat(col("text"), lit(s" w$k")).as("text"),
    col("lang"), col("source"), (col("n_chars") + lit(3L)).as("n_chars"))
}.reduce(_ unionByName _)
d10.coalesce(16).write.mode("overwrite").parquet(s"$out/documents.parquet")
val emb = spark.read.parquet(s"$src/embeddings.parquet")
val nE = emb.agg(max("vec_id")).first().getLong(0) + 1L
val e10 = (0 until 10).map { k =>
  emb.select(
    (col("vec_id") + lit(k * nE)).as("vec_id"),
    // perturb a DIFFERENT axis than derive_sf1 (dim 1 vs dim 0) by a
    // smaller step, so sf10d copies cluster near their sf1d parents
    // without collapsing to exact duplicates
    transform(col("embedding"), (x, i) =>
      when(i === 1, x + lit(k.toFloat * 0.005f)).otherwise(x))
      .as("embedding"),
    col("label"))
}.reduce(_ unionByName _)
e10.coalesce(16).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
spark.read.parquet(s"$src/region.parquet").coalesce(1)
  .write.mode("overwrite").parquet(s"$out/region.parquet")
spark.read.parquet(s"$src/nation.parquet").coalesce(1)
  .write.mode("overwrite").parquet(s"$out/nation.parquet")
println("DERIVED " +
  spark.read.parquet(s"$out/documents.parquet").count() + " docs, " +
  spark.read.parquet(s"$out/embeddings.parquet").count() + " vecs")
System.exit(0)
