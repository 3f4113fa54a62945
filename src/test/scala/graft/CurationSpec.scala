package graft

import graft.operators.{Curation, DataSplit}
import org.apache.spark.sql.functions._

/** Cluster-aware curation: canonical representative selection,
  * duplicate-aware (leakproof) splits, and exact histogram drift.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docsFx = Seq(
    (1L, 50L), (2L, 90L), (3L, 70L), (4L, 90L), (5L, 10L)
  ).toDF("doc_id", "q")

  // {1,2,4} are one cluster; 3 and 5 are singletons (absent rows)
  private def clustersFx = Seq((1L, 1L), (2L, 1L), (4L, 1L))
    .toDF("id", "root")

  test("canonicalPerCluster keeps max priority, ties to lowest id") {
    val out = Curation
      .canonicalPerCluster(docsFx, "doc_id", clustersFx, col("q"))
      .select("doc_id", "root", "keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    // ids 2 and 4 tie at q=90 — the lower id wins
    assert(out.toSeq == Seq((1L, 1L, false), (2L, 1L, true),
      (3L, 3L, true), (4L, 1L, false), (5L, 5L, true)))
  }

  test("canonical window partitions by root (no single-partition pass)") {
    val plan = Curation
      .canonicalPerCluster(docsFx, "doc_id", clustersFx, col("q"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"canonical selection must never gather to one partition:\n$plan")
  }

  test("leakproofSplit: cluster members all get the root's split") {
    val out = Curation.leakproofSplit(docsFx, "doc_id", clustersFx)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val rootSplit = DataSplit.withSplit(Seq(Tuple1(1L)).toDF("doc_id"),
      "doc_id").select("split").as[String].head()
    assert(out(1L) == rootSplit && out(2L) == rootSplit &&
      out(4L) == rootSplit)
    // singletons degenerate to the plain id-hash split exactly
    val plain = DataSplit.withSplit(docsFx, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out(3L) == plain(3L) && out(5L) == plain(5L))
  }

  test("leakproofSplit with no clusters equals the plain split") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "root")
    val a = Curation.leakproofSplit(docsFx, "doc_id", empty)
      .select("doc_id", "split")
    val b = DataSplit.withSplit(docsFx, "doc_id").select("doc_id", "split")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("histDrift: identical=0, disjoint=1000, hand case=500 exact") {
    // A and B identical; C disjoint from both; D is the hand case vs A
    val rows =
      Seq.fill(3)(("A", 0)) ++ Seq.fill(1)(("A", 1)) ++
      Seq.fill(3)(("B", 0)) ++ Seq.fill(1)(("B", 1)) ++
      Seq.fill(4)(("C", 7)) ++
      Seq.fill(1)(("D", 0)) ++ Seq.fill(3)(("D", 1))
    val df = rows.toDF("s", "v")
    val out = Curation.histDrift(df, "s", col("v"))
      .as[(String, String, Long)].collect()
      .map { case (a, b, tv) => (a, b) -> tv }.toMap
    assert(out(("A", "B")) == 0L)
    assert(out(("A", "C")) == 1000L && out(("B", "C")) == 1000L)
    // TV(A,D) = ((|3·4−1·4| + |1·4−3·4|)·500) div 16 = 500
    assert(out(("A", "D")) == 500L)
    assert(out.size == 6) // C(4,2) ordered pairs
  }

  test("histDrift: the NULL stratum is a first-class drift row") {
    // a null-source stratum must appear in every pair (sorted first),
    // not vanish through a bare s_a < s_b comparison — its shift is
    // exactly what a monitor must not be blind to
    val rows: Seq[(Option[String], Int)] =
      Seq.fill(3)((None, 0)) ++ Seq.fill(1)((None, 1)) ++
      Seq.fill(3)((Some("A"), 0)) ++ Seq.fill(1)((Some("A"), 1)) ++
      Seq.fill(4)((Some("B"), 7))
    val df = rows.toDF("s", "v")
    val out = Curation.histDrift(df, "s", col("v"))
      .as[(Option[String], Option[String], Long)].collect()
      .map { case (a, b, tv) => (a, b) -> tv }.toMap
    assert(out.size == 3, s"null stratum dropped from pairing: $out")
    assert(out((None, Some("A"))) == 0L)    // identical distributions
    assert(out((None, Some("B"))) == 1000L) // disjoint
    assert(out((Some("A"), Some("B"))) == 1000L)
  }

  test("canonical then leakproofSplit composes (operator-owned columns)") {
    val kept = Curation
      .canonicalPerCluster(docsFx, "doc_id", clustersFx, col("q"))
      .filter(col("keep"))
    val out = Curation.leakproofSplit(kept, "doc_id", clustersFx)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // the kept representative of cluster 1 is doc 2; its split must
    // still hash the cluster ROOT (1), not its own id
    val rootSplit = DataSplit.withSplit(Seq(Tuple1(1L)).toDF("doc_id"),
      "doc_id").select("split").as[String].head()
    assert(out.keySet == Set(2L, 3L, 5L) && out(2L) == rootSplit)
  }

  test("tvPermille matches NULL buckets null-safely and never loses rows") {
    // identical histograms INCLUDING a null bucket -> 0, one row
    val withNull = Seq(Some(0), Some(0), None).toDF("v")
    val h = Curation.histogram(withNull, col("v"))
    val same = Curation.tvPermille(h, h).collect()
    assert(same.length == 1 && same.head.getAs[Long]("tv_permille") == 0L)
    // both sides empty -> still exactly one row, NULL measurement
    val empty = Curation.histogram(withNull.filter(col("v") === 99), col("v"))
    val both = Curation.tvPermille(empty, empty).collect()
    assert(both.length == 1 && both.head.isNullAt(2))
    // histDrift agrees on null-bucket data
    val strata = Seq(("A", Some(0)), ("A", Some(0)), ("A", None),
      ("B", Some(0)), ("B", Some(0)), ("B", None)).toDF("s", "v")
    val drift = Curation.histDrift(strata, "s", col("v"))
      .select("tv_permille").as[Long].head()
    assert(drift == 0L)
  }

  test("tvPermille agrees with histDrift and handles empty sides") {
    val rows =
      Seq.fill(3)(("A", 0)) ++ Seq.fill(1)(("A", 1)) ++
      Seq.fill(1)(("D", 0)) ++ Seq.fill(3)(("D", 1))
    val df = rows.toDF("s", "v")
    val pairwise = Curation.histDrift(df, "s", col("v"))
      .select("tv_permille").as[Long].head()
    val onePair = Curation.tvPermille(
      Curation.histogram(df.filter(col("s") === "A"), col("v")),
      Curation.histogram(df.filter(col("s") === "D"), col("v")))
      .select("tv_permille").as[Long].head()
    assert(pairwise == onePair && onePair == 500L)
    val vsEmpty = Curation.tvPermille(
      Curation.histogram(df.filter(col("s") === "zzz"), col("v")),
      Curation.histogram(df, col("v")))
      .select(col("tv_permille")).collect()
    assert(vsEmpty.length == 1 && vsEmpty.head.isNullAt(0))
  }

  test("histDrift never re-scans the input downstream of the histogram") {
    val df = (1 to 100).map(i => (s"s${i % 3}", i % 5)).toDF("s", "v")
    val plan = Curation.histDrift(df, "s", col("v"))
      .queryExecution.executedPlan.toString
    // lineage is cut at the strata×buckets histogram: the result plan
    // reads the checkpointed RDD, not the input relation
    assert(plan.contains("Scan ExistingRDD") && !plan.contains("LocalTableScan"),
      s"drift must pair on the materialized histogram only:\n$plan")
  }
}
