import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
val src = "/root/testdata/sf0.1"
val out = "/tmp/sf1d"
val docs = spark.read.parquet(s"$src/documents.parquet")
// stride derived from the data: hardcoding the table size would
// silently collide ids if the source corpus is ever regenerated larger
val nD = docs.agg(max("doc_id")).first().getLong(0) + 1L
val d10 = (0 until 10).map { k =>
  docs.select(
    (col("doc_id") + lit(k * nD)).as("doc_id"),
    // per-copy suffix token keeps copies NEAR-dups, not exact dups,
    // so dedup-family work scales like a real 10x corpus
    concat(col("text"), lit(s" v$k")).as("text"),
    col("lang"), col("source"), (col("n_chars") + lit(3L)).as("n_chars"))
}.reduce(_ unionByName _)
d10.coalesce(4).write.mode("overwrite").parquet(s"$out/documents.parquet")
val emb = spark.read.parquet(s"$src/embeddings.parquet")
val nE = emb.agg(max("vec_id")).first().getLong(0) + 1L
val e10 = (0 until 10).map { k =>
  emb.select(
    (col("vec_id") + lit(k * nE)).as("vec_id"),
    transform(col("embedding"), (x, i) =>
      when(i === 0, x + lit(k.toFloat * 0.01f)).otherwise(x)).as("embedding"),
    col("label"))
}.reduce(_ unionByName _)
e10.coalesce(4).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
println("DERIVED " + spark.read.parquet(s"$out/documents.parquet").count() +
  " docs, " + spark.read.parquet(s"$out/embeddings.parquet").count() + " vecs")
