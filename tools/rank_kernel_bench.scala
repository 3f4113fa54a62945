// Isolated rank-kernel cost sweep (VERDICT r10 item 3's "measured
// gate delta"): the door-level ingest bench buries the semantic
// gate's rank kernel under the other four gates (its stage deltas sit
// inside the ±2 s sweep noise at K in the hundreds) — this measures
// the kernel ALONE: one map-only scan over N rows computing the
// top-nProbe centroid ranks, flat CentroidRankKernel (O(K·dim)/row)
// vs TwoLevelRankKernel (O(wProbe·√K·dim)/row), at K from the
// hundreds to the 10⁵ regime √N sizing implies for a 10B-vector
// corpus. Run:
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 8g \
//     --jars target/scala-2.13/sparkibmmqspark_2.13-0.1.0.jar \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=32 \
//     -I tools/rank_kernel_bench.scala <<< ""
// Results → docs/SCALE.md (round 11).
import org.apache.spark.sql.functions._
import graft.operators.Similarity

val N = sys.env.getOrElse("ROWS", "200000").toInt
val DIM = sys.env.getOrElse("DIM", "64").toInt
val REPS = sys.env.getOrElse("REPS", "3").toInt
// paren-wrapped: spark-shell -I does not continue statements across
// lines starting with "." (the ingest_bench note)
val KS = (sys.env.getOrElse("KS", "256,1024,4096,16384,65536")
  .split(",").map(_.trim.toInt).toSeq)

// deterministic synthetic arrivals: clustered like an embedding space
val rows = (spark.range(N.toLong)
  .select(col("id"), transform(sequence(lit(0), lit(DIM - 1)), j =>
    (pmod(xxhash64(col("id") % 64, j), lit(1000L)).cast("double")
      + pmod(xxhash64(col("id"), j + lit(DIM)), lit(100L)).cast("double") / 100.0d)
    .as("x")).as("v"))
  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
rows.count()

def centsOf(k: Int): Seq[(Long, Seq[Double])] = (0 until k).map { i =>
  (i.toLong, (0 until DIM).map(j =>
    ((i * 131 + j * 17) % 1000).toDouble + (i % 97).toDouble / 100.0d))
}

def time(f: => Long): Double = {
  var best = Double.MaxValue
  for (_ <- 1 to REPS) {
    val t0 = System.nanoTime
    f
    val s = (System.nanoTime - t0) / 1e9
    if (s < best) best = s
  }
  best
}

println(f"rows=$N dim=$DIM nProbe=2 reps=$REPS (best-of)")
println("K        flat_s   2lvl_s   ratio  supers wProbe")
KS.foreach { k =>
  val cents = centsOf(k)
  val tlq = Similarity.twoLevelQuantizer(cents)
  val w = 2
  val flat = time(rows.select(
    Similarity.centroidRanks(col("v"), cents, 2).as("r"))
    .selectExpr("sum(size(r))").head().getLong(0))
  val two = time(rows.select(
    Similarity.centroidRanksTwoLevel(col("v"), tlq, 2, w).as("r"))
    .selectExpr("sum(size(r))").head().getLong(0))
  println(f"$k%-8d $flat%7.2f  $two%7.2f  ${flat / two}%5.1fx  ${tlq.supers.size}%5d  $w%5d")
}
rows.unpersist()
