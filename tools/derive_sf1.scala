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
// Relational tables for the graph-shaped queries (pagerank, fuzzy
// join): every key offset by k*stride so the 10 copies are DISJOINT —
// the purchase graph becomes 10 disjoint components with |V| and |E|
// both 10x, the honest "bigger corpus" shape (a shared-key replication
// would instead multiply edge multiplicity, which distinct() erases).
val ord = spark.read.parquet(s"$src/orders.parquet")
val nO = ord.agg(max("o_orderkey")).first().getLong(0) + 1L
val cust = spark.read.parquet(s"$src/customer.parquet")
val nC = cust.agg(max("c_custkey")).first().getLong(0) + 1L
val li = spark.read.parquet(s"$src/lineitem.parquet")
val nS = li.agg(max("l_suppkey")).first().getLong(0) + 1L
// part stride must cover BOTH sides of the part-lineitem join
val nP = math.max(
  spark.read.parquet(s"$src/part.parquet")
    .agg(max("p_partkey")).first().getLong(0),
  li.agg(max("l_partkey")).first().getLong(0)) + 1L
val o10 = (0 until 10).map { k =>
  ord.withColumn("o_orderkey", col("o_orderkey") + lit(k * nO))
    .withColumn("o_custkey", col("o_custkey") + lit(k * nC))
}.reduce(_ unionByName _)
o10.coalesce(4).write.mode("overwrite").parquet(s"$out/orders.parquet")
val l10 = (0 until 10).map { k =>
  li.withColumn("l_orderkey", col("l_orderkey") + lit(k * nO))
    .withColumn("l_suppkey", col("l_suppkey") + lit(k * nS))
    .withColumn("l_partkey", col("l_partkey") + lit(k * nP))
}.reduce(_ unionByName _)
l10.coalesce(8).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
// customer names get the same per-copy NEAR-dup suffix as documents:
// cross-copy name pairs land within the edit-distance budget, so the
// fuzzy join's 10x row is the adversarial output-bound case (same
// stance as the near-dup tables above)
val c10 = (0 until 10).map { k =>
  cust.withColumn("c_custkey", col("c_custkey") + lit(k * nC))
    .withColumn("c_name", concat(col("c_name"), lit(s" v$k")))
}.reduce(_ unionByName _)
c10.coalesce(4).write.mode("overwrite").parquet(s"$out/customer.parquet")
// The remaining fact tables replicate 10x with the same disjoint-key
// offsets (supplier/part strides taken from the tables lineitem's
// foreign keys point at, so the joins stay consistent); events offset
// both ids AND shift each copy's timestamps by k hours so the
// event-time windows carry 10x live content instead of 10x
// multiplicity in the same windows. region/nation copy UNSCALED -
// they are fixed dimension tables at every TPC-H scale factor.
val sup = spark.read.parquet(s"$src/supplier.parquet")
val s10 = (0 until 10).map { k =>
  sup.withColumn("s_suppkey", col("s_suppkey") + lit(k * nS))
}.reduce(_ unionByName _)
s10.coalesce(2).write.mode("overwrite").parquet(s"$out/supplier.parquet")
val part = spark.read.parquet(s"$src/part.parquet")
val p10 = (0 until 10).map { k =>
  part.withColumn("p_partkey", col("p_partkey") + lit(k * nP))
}.reduce(_ unionByName _)
p10.coalesce(2).write.mode("overwrite").parquet(s"$out/part.parquet")
val ev = spark.read.parquet(s"$src/events.parquet")
val nEv = ev.agg(max("event_id")).first().getLong(0) + 1L
val nU = ev.agg(max("user_id")).first().getLong(0) + 1L
val ev10 = (0 until 10).map { k =>
  ev.withColumn("event_id", col("event_id") + lit(k * nEv))
    .withColumn("user_id", col("user_id") + lit(k * nU))
    .withColumn("ts", col("ts") + expr(s"INTERVAL $k HOURS"))
}.reduce(_ unionByName _)
ev10.coalesce(4).write.mode("overwrite").parquet(s"$out/events.parquet")
spark.read.parquet(s"$src/region.parquet").coalesce(1)
  .write.mode("overwrite").parquet(s"$out/region.parquet")
spark.read.parquet(s"$src/nation.parquet").coalesce(1)
  .write.mode("overwrite").parquet(s"$out/nation.parquet")
println("DERIVED " + spark.read.parquet(s"$out/documents.parquet").count() +
  " docs, " + spark.read.parquet(s"$out/embeddings.parquet").count() + " vecs, " +
  spark.read.parquet(s"$out/lineitem.parquet").count() + " lineitems, " +
  spark.read.parquet(s"$out/customer.parquet").count() + " customers")
