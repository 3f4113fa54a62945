package graft

import graft.operators.{FuzzyJoin, Graph}
import org.apache.spark.sql.functions._

/** FuzzyJoin (ED-join prefix filtering) and Graph (integer PageRank):
  * result parity against brute force / a reference recurrence, plus
  * the plan-shape invariants the scale story depends on (no nested-
  * loop joins in the fuzzy join; PageRank's plan must not grow with
  * the iteration count).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // ---- FuzzyJoin --------------------------------------------------

  /** Adversarial corpus: substitutions, insert/delete (length skew),
    * repeated grams (multiset prefixes), gram-less short strings that
    * must ride the fallback, a null, and true negatives. */
  private val fuzzyRows = Seq(
    (1L, "kettle corn roasted"),
    (2L, "kettle corn toasted"),   // 1 sub of #1
    (3L, "kettlecorn roasted"),    // 1 del of #1
    (4L, "kettle corn roasted!!"), // 2 ins of #1
    (5L, "abcabcabc"),
    (6L, "abcabcabX"),             // 1 sub of #5, repeated grams
    (7L, "abcd"),                  // short: 2 grams at q=3
    (8L, "abxd"),                  // short, dist 1 of #7, shares NO gram
    (9L, "zzzz"),                  // short true negative
    (10L, null.asInstanceOf[String]),
    (11L, "completely different payload")
  )

  private def bruteForce(maxDist: Int, q: Int) = {
    val base = fuzzyRows.toDF("id", "s")
      .filter(col("s").isNotNull && length(col("s")) >= q)
    base.as("a").join(base.as("b"), col("a.id") < col("b.id"))
      .withColumn("dist",
        levenshtein(col("a.s"), col("b.s")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("dist"))
  }

  test("edSelfJoin matches brute force (k=1 and k=2)") {
    for (k <- Seq(1, 2)) {
      val got = FuzzyJoin.edSelfJoin(fuzzyRows.toDF("id", "s"),
        "id", "s", maxDist = k)
      val want = bruteForce(k, q = 3)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"k=$k: got ${got.collect().toSeq} want ${want.collect().toSeq}")
    }
  }

  test("edSelfJoin finds short pairs sharing zero grams") {
    val got = FuzzyJoin.edSelfJoin(fuzzyRows.toDF("id", "s"),
        "id", "s", maxDist = 1)
      .filter(col("id_a") === 7L && col("id_b") === 8L).count()
    assert(got == 1L) // "abcd" ~ "abxd" only reachable via the fallback
  }

  test("edSelfJoin plans equi-joins only (no nested loop, no cartesian)") {
    val out = FuzzyJoin.edSelfJoin(fuzzyRows.toDF("id", "s"),
      "id", "s", maxDist = 2, persistBase = false)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"fuzzy join must stay an equi-join:\n$plan")
  }

  /** Residue check that is race-proof both ways: a set-diff (the
    * async ContextCleaner may release OLDER suites' blocks mid-test,
    * so counts are flaky) with a bounded poll (Dataset.unpersist is
    * NON-blocking, so an explicitly released block may still be
    * listed for a few ms; a true leak — persist with no unpersist —
    * never clears). localCheckpoint RDDs are lineage anchors the
    * cleaner owns, not residue. */
  private def assertNoNewResidue(run: => Unit): Unit = {
    def now = spark.sparkContext.getPersistentRDDs
      .filter { case (_, r) => !r.toString.contains("localCheckpoint") }
      .keySet.toSet
    val before = now
    run
    var added = now -- before
    val deadline = System.nanoTime + 5L * 1000 * 1000 * 1000
    while (added.nonEmpty && System.nanoTime < deadline) {
      Thread.sleep(50); added = now -- before
    }
    assert(added.isEmpty, s"leaked persisted RDD ids: $added")
  }

  test("edSelfJoin persistBase=true leaves zero cache residue") {
    assertNoNewResidue {
      FuzzyJoin.edSelfJoin(fuzzyRows.toDF("id", "s"), "id", "s", 1)
        .count()
      ()
    }
  }

  // ---- Graph.pagerank ---------------------------------------------

  /** Reference recurrence in plain Scala: same integer micro-unit
    * arithmetic over the same deduped symmetric edge set. */
  private def refPagerank(edges: Seq[(Long, Long)], iters: Int,
                          dampingPct: Int): Map[Long, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = deg.keySet
    val base = (100 - dampingPct) * 10000L
    var rank: Map[Long, Long] = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => rank(s) / deg(s) }.sum
      }
      rank = nodes.map(n =>
        n -> (base + dampingPct * in.getOrElse(n, 0L) / 100)).toMap
    }
    rank
  }

  // symmetric star + chain with a duplicate edge to exercise distinct
  private val prEdges = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L),
    (5L, 6L), (1L, 2L)).flatMap { case (a, b) => Seq((a, b), (b, a)) })

  test("pagerank matches the integer reference recurrence") {
    val got = Graph.pagerank(prEdges.toDF("src", "dst"), "src", "dst",
        iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPagerank(prEdges, 4, 85))
  }

  test("pagerank dampingPct=100 has no teleport mass") {
    val got = Graph.pagerank(prEdges.toDF("src", "dst"), "src", "dst",
        iterations = 2, dampingPct = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPagerank(prEdges, 2, 100))
    assert(got.values.forall(_ > 0))
  }

  test("pagerank plan size is independent of iteration count") {
    // persistEdges = false skips the final forced materialization, so
    // the returned plan EXPOSES the lazy tail above the last
    // checkpoint — without that the assertions below would compare
    // two constant-size LogicalRDD leaves and could never fail
    // explicit checkpointEvery = 3: the truncation-period logic must
    // stay covered whatever the default cadence is
    def planNodes(iters: Int): Int =
      Graph.pagerank(prEdges.toDF("src", "dst"), "src", "dst", iters,
        persistEdges = false, checkpointEvery = 3)
        .queryExecution.optimizedPlan.collect { case p => p }.size
    // at a boundary: both plans are a checkpoint leaf
    assert(planNodes(6) == planNodes(3),
      "localCheckpoint must truncate lineage at the checkpoint period")
    // one superstep PAST a boundary: same-depth tails must match, and
    // must be strictly deeper than the boundary leaf — this is the
    // assertion that fails if the mid-loop truncation stops firing
    assert(planNodes(7) == planNodes(4),
      "lazy tails at equal offsets past a checkpoint must match")
    assert(planNodes(7) > planNodes(6),
      "an off-boundary tail must sit above the checkpoint leaf")
  }

  test("pagerank is bit-identical at every checkpointEvery setting") {
    // the lazy-chain refactor touches ONLY materialization boundaries;
    // the recurrence itself must not move by a single micro-unit
    def run(ce: Int): Map[Long, Long] =
      Graph.pagerank(prEdges.toDF("src", "dst"), "src", "dst",
        iterations = 5, checkpointEvery = ce)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val every = run(1)
    assert(run(3) == every && run(5) == every)
    assert(every == refPagerank(prEdges, 5, 85))
  }

  test("pagerank leaves zero cache residue and rejects bad args") {
    assertNoNewResidue {
      Graph.pagerank(prEdges.toDF("src", "dst"), "src", "dst", 1).count()
      ()
    }
    intercept[IllegalArgumentException] {
      Graph.pagerank(prEdges.toDF("src", "dst"), "src", "dst", 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pagerank(prEdges.toDF("src", "dst"), "src", "dst", 1,
        dampingPct = 101)
    }
  }
}
