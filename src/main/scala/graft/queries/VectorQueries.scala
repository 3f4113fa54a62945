package graft.queries

import graft.{QueryFn, Tables, rnd}
import graft.operators.{Dedup, Pca, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search surface over `embeddings` (ArrayType(FloatType)):
  * exact brute-force cosine top-k (oracle-checked), kNN label vote
  * (oracle-checked), embedding-cosine near-dup (oracle-checked, bounded
  * candidates), and the LSH-bucketed ANN scale path (rows-only check —
  * the bucketing hash is not oracle-expressible).
  *
  * The oracle SQL computes the identical double-precision kernel by
  * indexing list elements with generate_series, so both engines widen
  * float32 -> float64 exactly and round to 4 decimals.
  */
object VectorQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  private val nQueries = 20

  val queries: Map[String, QueryFn] = Map(

    "q_sim_cosine_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < nQueries)
      Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
        .select(col("q_id"), col("rank").cast("long").as("rank"),
          col("c_id"), rnd(col("cos"), 4).as("cos"))
        .orderBy("q_id", "rank")
    }),

    "q_sim_knn_label" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < nQueries)
      Similarity.knnLabel(q, emb, "vec_id", "embedding", "label", 5)
        .select(col("q_id"), col("pred_label").cast("long").as("pred_label"))
        .orderBy("q_id")
    }),

    "q_mine_hard_negatives" -> ((s, d) => {
      // Contrastive-training data prep: for each anchor, the 5 most
      // cosine-similar vectors with a DIFFERENT label — the negatives
      // that sit closest to the decision boundary. Exact (oracle
      // twin); corpus-wide mining rides any staged ANN index with a
      // group-filtered overfetch.
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < nQueries)
      Similarity.hardNegatives(q, emb, "vec_id", "embedding", "label", 5)
        .select(col("q_id"), col("rank").cast("long").as("rank"),
          col("c_id"), rnd(col("cos"), 4).as("cos"))
        .orderBy("q_id", "rank")
    }),

    "q_embed_rproject" -> ((s, d) => {
      // JL random projection 64 -> 16 dims with the deterministic
      // md5-coin ±1 matrix: micro-quantized inputs make every
      // component an exact BIGINT. Emitted one row per component
      // (the harness compare is scalar-column), so the oracle checks
      // EVERY projected value, not a summary. The shrink feeds ANN
      // (see the rproject recall row in q_sim_ann_recall for the
      // measured ranking cost of 4x fewer dims).
      Similarity.randomProject(t(s, d, "embeddings"), "vec_id",
          "embedding", dim = 64, outDim = 16)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "yj")))
        .select(col("vec_id"), col("j").cast("long").as("j"), col("yj"))
        .orderBy("vec_id", "j")
    }),

    "q_pca_moments" -> ((s, d) => {
      // The distributed half of PCA: exact micro-unit covariance
      // moments, one row per dimension pair. Every value is an exact
      // integer (BIGINT-safe at driver scales per the §7.4 rule —
      // the operator itself carries DECIMAL(38,0)), so the fitted
      // basis downstream is a pure function of the data.
      Pca.covMoments(t(s, d, "embeddings"), "vec_id", "embedding")
        .select(col("i"), col("j"), col("n"),
          col("s_i").cast("long").as("s_i"),
          col("s_j").cast("long").as("s_j"),
          col("s_ij").cast("long").as("s_ij"),
          col("cov_num").cast("long").as("cov_num"))
        .orderBy("i", "j")
    }),

    "q_pca_project" -> ((s, d) => {
      // The apply half: basis fit from the exact moments (driver-side
      // deterministic power iteration — train once), deployed as a
      // map-only literal-matrix projection, the distill/kmeans
      // literal-artifact stance. Rows-only: the eigensolve isn't
      // oracle-expressible; PcaSpec pins planted-axis recovery,
      // orthonormality, partitioning invariance, and the exact-moment
      // input is oracle-checked via q_pca_moments.
      val emb = t(s, d, "embeddings")
      val model = Pca.fit(emb, "vec_id", "embedding", dim = 64, k = 4)
      Pca.project(emb, "embedding", model)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("c", "y")))
        .select(col("vec_id"), col("c").cast("long").as("c"),
          rnd(col("y") / 1000000.0d, 4).as("y"))
        .orderBy("vec_id", "c")
    }),

    "q_dedup_embedding" -> ((s, d) => {
      Dedup.embeddingNearDups(t(s, d, "embeddings"), "vec_id", "embedding",
          threshold = 0.35, maxIdGap = 50L)
        .orderBy("id_a", "id_b")
    }),

    "q_sim_ann_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < nQueries)
      Similarity.lshTopK(q, emb, "vec_id", "embedding", 3, nPlanes = 4)
        .select(col("q_id"), col("rank").cast("long").as("rank"),
          col("c_id"), rnd(col("cos"), 4).as("cos"))
        .orderBy("q_id", "rank")
    }),

    "q_sim_ann_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < nQueries)
      Similarity.ivfTopK(q, emb, "vec_id", "embedding", 3, nProbe = 4)
        .select(col("q_id"), col("rank").cast("long").as("rank"),
          col("c_id"), rnd(col("cos"), 4).as("cos"))
        .orderBy("q_id", "rank")
    }),

    "q_sim_ann_pq" -> ((s, d) => {
      // Product-quantization ADC top-k: codes are 32× smaller than
      // the raw vectors, scan does m table lookups per pair, exact
      // rerank on the shortlist. Rows-only (trained codebook isn't
      // oracle-expressible); SimilaritySpec pins the hand-codebook
      // argmin, determinism, and a recall floor.
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < nQueries)
      Similarity.pqTopK(q, emb, "vec_id", "embedding", 3)
        .select(col("q_id"), col("rank").cast("long").as("rank"),
          col("c_id"), rnd(col("cos"), 4).as("cos"))
        .orderBy("q_id", "rank")
    }),

    "q_sim_ann_ivfpq" -> ((s, d) => {
      // Composed IVF+PQ (FAISS IVFPQ): Lloyd-trained coarse quantizer
      // (balanced lists — measured +0.05 recall@3 over hash-sampled
      // centroids at sf0.1), raw PQ codes (residual codes measured
      // WORSE on this corpus — see ivfPqIndex scaladoc), exact rerank
      // on the shortlist. Rows-only (trained coarse+fine quantizers
      // aren't oracle-expressible); SimilaritySpec pins a recall
      // floor + determinism, ScaleSpec the exchange-free build and
      // all-broadcast query joins.
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < nQueries)
      Similarity.ivfPqTopK(q, emb, "vec_id", "embedding", 3, nProbe = 4,
          trainCoarse = true)
        .select(col("q_id"), col("rank").cast("long").as("rank"),
          col("c_id"), rnd(col("cos"), 4).as("cos"))
        .orderBy("q_id", "rank")
    }),

    "q_sim_ann_recall" -> ((s, d) => {
      // recall@k of all four ANN paths vs the exact brute-force twin
      // on the SAME queries — the approximation error as a
      // first-class number (rows-only: the LSH/IVF/PQ index structures
      // aren't oracle-expressible, but determinism is spec-covered).
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < nQueries)
      val k = 3
      // the brute-force twin feeds both recall rows — persist its
      // (tiny, |queries|*k) result so the corpus-wide NLJ runs once,
      // not once per method (lifecycle: session clearCache, like the
      // other operators' narrow indexes)
      val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // each ANN index (the expensive artifact) is built/persisted
      // ONCE via the staged entry points and feeds its top-k list;
      // the three recall aggregates union into one plan, so a single
      // action materializes everything (r4 action item #3)
      val lsh = Similarity.lshTopKWith(
        Similarity.lshIndex(emb, "vec_id", "embedding", nPlanes = 4),
        q, "vec_id", "embedding", k)
      val ivf = Similarity.ivfTopKWith(
        Similarity.ivfIndex(emb, "vec_id", "embedding"),
        q, "vec_id", "embedding", k, nProbe = 4)
      val pq = Similarity.pqTopKWith(
        Similarity.pqIndex(emb, "vec_id", "embedding"),
        q, emb, "vec_id", "embedding", k)
      val ivfpq = Similarity.ivfPqTopKWith(
        Similarity.ivfPqIndex(emb, "vec_id", "embedding",
          trainCoarse = true),
        q, emb, "vec_id", "embedding", k, nProbe = 4)
      // the dim-reduction path measured on the same axis: brute force
      // in the 16-dim projected space vs the 64-dim exact twin — the
      // ranking cost of a 4x storage/compute shrink as a number
      val projected = Similarity.randomProject(emb, "vec_id",
        "embedding", dim = 64, outDim = 16).select("vec_id", "proj")
      val rp = Similarity.bruteForceTopK(
        projected.filter(col("vec_id") < nQueries), projected,
        "vec_id", "proj", k)
      Similarity.recallAtK(exact, lsh, "lsh")
        .unionByName(Similarity.recallAtK(exact, ivf, "ivf"))
        .unionByName(Similarity.recallAtK(exact, pq, "pq"))
        .unionByName(Similarity.recallAtK(exact, ivfpq, "ivfpq"))
        .unionByName(Similarity.recallAtK(exact, rp, "rproject"))
        .orderBy("method")
    }),

    "q_sim_ann_xl_parity" -> ((s, d) => {
      // XL-quantizer parity audit (round 10): the broadcast-transport
      // assignment and probe forms must agree with the plan-literal
      // forms EXACTLY (same math, different transport — the form the
      // engine auto-switches to past LiteralQuantizerMax centroids,
      // where √N sizing of a 10B-vector corpus lands), and the
      // two-level hierarchy must clear its agreement floor. One-row
      // verdict with a CONSTANT oracle — the *_precision audit shape:
      // any transport divergence flips a diff counter, an empty
      // corpus OR an empty compare sample flips checked_nonzero, so
      // it cannot pass vacuously.
      val emb = t(s, d, "embeddings").filter(col("embedding").isNotNull)
      val n = emb.count()
      val k = Similarity.suggestedNCentroids(n)
      val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", k)
      val cands = emb.select(col("vec_id").cast("long").as("c_id"),
        Similarity.toDouble(col("embedding")).as("c_vec"))
      // assignment parity with BOTH transports pinned — comparing the
      // index's own assignment against a broadcast recompute would go
      // vacuous exactly where it matters (past LiteralQuantizerMax the
      // build side IS the broadcast form; √N crosses 64 at the derived
      // sf1 run, K≈448). The literal fold at XL K is the interpreted
      // cost the dispatch exists to avoid, so the pinned compare runs
      // on a deterministic id-spread sample (≤2048 rows — parity is
      // per-row, so the sample is coverage, not an estimate); full
      // corpus wherever n ≤ 2048
      val samStep = math.max(1L, n / 2048L)
      val sample = cands.filter(pmod(col("c_id"), lit(samStep)) === 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // the non-vacuous guard must cover the SAMPLE, not just the
      // corpus: an id distribution that misses every residue-0 id
      // would zero the diffs with nothing compared
      val nSample = sample.count()
      val exact = Similarity.ivfAssignBroadcast(sample, idx.cents)
        .select(col("c_id"), col("cent_id").as("cent_bc"))
      val assignDiff = Similarity
        .ivfAssignLiteral(sample, idx.cents)
        .select(col("c_id"), col("cent_id"))
        .join(exact, "c_id")
        .filter(!(col("cent_id") <=> col("cent_bc"))).count()
      val q = emb.filter(col("vec_id") < nQueries)
      // transport-pinned forms on BOTH sides here too: ivfTopKWith
      // auto-dispatches to XL past the literal boundary (the sf1-scale
      // run), where comparing it against ivfTopKXL would be vacuous
      val lit3 = Similarity.ivfTopKLiteral(idx, q, "vec_id",
        "embedding", 3, nProbe = 4).select("q_id", "rank", "c_id")
      val xl3 = Similarity.ivfTopKXL(idx, q, "vec_id", "embedding",
        3, nProbe = 4).select("q_id", "rank", "c_id")
      val probeDiff =
        lit3.exceptAll(xl3).count() + xl3.exceptAll(lit3).count()
      // two-level contract checkable at ANY corpus: full-probe
      // routing is EXACT (narrow-wProbe agreement is a corpus-shape
      // property — ~0.98 at wProbe=4 on sf0.01 but needing
      // wProbe ≈ 2/3·k1 on the structureless sf1 embeddings, the
      // measured curve in docs/SCALE.md — so it is data, not a gate)
      val tlq = Similarity.twoLevelQuantizer(idx.cents)
      val two = Similarity.ivfAssignTwoLevel(sample, tlq,
        wProbe = tlq.supers.size)
        .select(col("c_id"), col("cent_id").as("cent_tl"))
      val tlDiff = exact.join(two, "c_id")
        .filter(!(col("cent_bc") <=> col("cent_tl"))).count()
      // round 11: the hierarchical PROBE twin (the TwoLevelRankKernel
      // through ivfTopKHier) at full wProbe must return exactly the
      // XL probe's results — the query-stage parity of the same
      // full-probe-is-exact contract the assignment compare pins
      val hier3 = Similarity.ivfTopKHier(idx, q, "vec_id", "embedding",
        3, tlq, nProbe = 4, wProbe = tlq.supers.size)
        .select("q_id", "rank", "c_id")
      val hierDiff =
        hier3.exceptAll(xl3).count() + xl3.exceptAll(hier3).count()
      // PQ transport parity at the DEFAULT m=8 × ksub=16 shape (128
      // codewords — past CodebookLiteralMax, so production takes the
      // broadcast loop; this pins it against the expression form).
      // Transport parity holds for ANY codebook, so train cheaply:
      // 2 Lloyd rounds on a 2048 sample, not the production 5/4096.
      // The encode compare runs on the same id-spread sample as the
      // assign parity — the literal form past CodebookLiteralMax is
      // the measured-5x interpreted fold the dispatch avoids, and
      // per-row parity needs row coverage, not corpus volume
      val book = Similarity.pqTrain(emb, "vec_id", "embedding",
        8, 16, 2, 2048)
      val sampleEmb = emb
        .filter(pmod(col("vec_id").cast("long"), lit(samStep)) === 0)
      val pl = Similarity.pqEncodeLiteral(sampleEmb, "vec_id",
        "embedding", book).select(col("c_id"),
        col("codes").as("codes_l"), col("c_norm").as("norm_l"))
      val pb = Similarity.pqEncodeBroadcast(sampleEmb, "vec_id",
        "embedding", book).select(col("c_id"),
        col("codes").as("codes_b"), col("c_norm").as("norm_b"))
      val pqDiff = pl.join(pb, "c_id")
        .filter(col("codes_l") =!= col("codes_b") ||
          !(col("norm_l") <=> col("norm_b"))).count()
      // every compare above is an eager count, so nothing still needs
      // the caches — release them here rather than letting them pile
      // up across a 132-query sweep (the sweep-inflation failure mode
      // Bench.scala documents)
      sample.unpersist()
      idx.assigned.unpersist()
      import s.implicits._
      Seq((if (n > 0 && nSample > 0) 1L else 0L,
          assignDiff, probeDiff, tlDiff, hierDiff, pqDiff))
        .toDF("checked_nonzero", "n_assign_diff", "n_probe_diff",
          "n_twolevel_fullprobe_diff", "n_hier_probe_diff",
          "n_pq_encode_diff")
    }),

    "q_embed_cluster" -> ((s, d) => {
      // Semantic grouping: k-means over the embeddings, summarized
      // per cluster (size + inertia). Rows-only — an iterative
      // clustering isn't oracle-expressible — with spec coverage for
      // cluster recovery and run-to-run determinism; d2 sums go
      // through DECIMAL so the inertia is partition-order-exact.
      graft.operators.Similarity
        .kmeans(t(s, d, "embeddings"), "vec_id", "embedding",
          k = 8, maxIter = 5)
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_vecs"),
          rnd(sum(col("d2").cast("decimal(30,6)")).cast("double"), 4)
            .as("inertia"))
        .orderBy("cluster")
    }),

    "q_embed_cluster_audit" -> ((s, d) => {
      // Convergence as a query result (the clustering twin of
      // q_sim_ann_recall): one row per Lloyd round with the exact-
      // decimal inertia of that round's assignment and the max
      // centroid displacement of its update. Rows-only — iterative
      // clustering isn't oracle-expressible — with KMeansSpec pinning
      // the monotone non-increasing inertia Lloyd's guarantees.
      import s.implicits._
      Similarity
        .kmeansWithAudit(t(s, d, "embeddings"), "vec_id", "embedding",
          k = 8, maxIter = 5)
        .audit.toDF()
        .select(col("round").cast("long").as("round"),
          rnd(col("inertia"), 4).as("inertia"),
          rnd(col("moved"), 6).as("moved"))
        .orderBy("round")
    }),

    "q_semdedup" -> ((s, d) => {
      // Cluster-then-dedup curation capstone: k-means clusters, then
      // cosine-near-identical members collapse to their group's min
      // id. Rows-only (k-means upstream); the SemDedupSpec pins the
      // keep/drop semantics on a constructed fixture.
      graft.operators.SemDedup
        .semDedup(t(s, d, "embeddings"), "vec_id", "embedding",
          k = 8, cosThreshold = 0.99, maxIter = 5)
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"))
        .orderBy("cluster")
    }),

    "q_embed_quantize" -> ((s, d) => {
      // Int8 storage quantization, summarized per vector (scalar
      // outputs keep the oracle hash exact while covering every code).
      val q = Similarity.quantizeInt8(
        Similarity.toDouble(col("embedding")))
      t(s, d, "embeddings").select(col("vec_id"), q.as("q"))
        .select(col("vec_id"),
          aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
          array_min(col("q")).as("q_min"),
          array_max(col("q")).as("q_max"),
          element_at(col("q"), 1).as("q_first"))
        .orderBy("vec_id")
    }),

    "q_embed_outliers" -> ((s, d) => {
      // Per-label centroid outliers (D4-style prune signal): the 10
      // farthest vectors from their own group's centroid, distances
      // in exact micro² integer units.
      graft.operators.EmbeddingStats
        .centroidOutliers(t(s, d, "embeddings"), "vec_id", "embedding",
          "label", k = 10)
        .select(col("grp").cast("long").as("label"), col("rank"),
          col("id").as("vec_id"), col("dist2_micro"))
        .orderBy("label", "rank")
    })
  )

  /** Shared DuckDB kernel: dot & norms via 1-indexed list access. */
  private def duckCosine(aTbl: String, bTbl: String,
                         aFilter: String, pairCond: String): String =
    s"""WITH dims AS (SELECT unnest(generate_series(1, 64)) AS i),
       |na AS (SELECT vec_id, sqrt(sum(CAST(embedding[i] AS DOUBLE)
       |         * CAST(embedding[i] AS DOUBLE))) AS nrm
       |       FROM embeddings, dims
       |       WHERE embedding IS NOT NULL GROUP BY vec_id),
       |pairs AS (
       |  SELECT a.vec_id AS q_id, b.vec_id AS c_id,
       |    sum(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS dot
       |  FROM $aTbl a JOIN $bTbl b ON $pairCond, dims
       |  WHERE ($aFilter)
       |    AND a.embedding IS NOT NULL AND b.embedding IS NOT NULL
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT p.q_id, p.c_id,
       |    CASE WHEN x.nrm * y.nrm = 0 THEN 0
       |         ELSE p.dot / (x.nrm * y.nrm) END AS cos
       |  FROM pairs p JOIN na x ON x.vec_id = p.q_id
       |               JOIN na y ON y.vec_id = p.c_id)""".stripMargin

  val oracle: Map[String, String] = Map(
    // constant verdict row, the *_precision audit shape: the index
    // structures are not oracle-enumerable, but the cross-transport
    // parity contract is still hash-checkable
    "q_sim_ann_xl_parity" ->
      ("SELECT CAST(1 AS BIGINT) AS checked_nonzero, " +
        "CAST(0 AS BIGINT) AS n_assign_diff, " +
        "CAST(0 AS BIGINT) AS n_probe_diff, " +
        "CAST(0 AS BIGINT) AS n_twolevel_fullprobe_diff, " +
        "CAST(0 AS BIGINT) AS n_hier_probe_diff, " +
        "CAST(0 AS BIGINT) AS n_pq_encode_diff"),

    "q_sim_cosine_topk" ->
      (duckCosine("embeddings", "embeddings",
        s"a.vec_id < $nQueries", "a.vec_id <> b.vec_id") +
        """
          |SELECT q_id, rank, c_id, floor((cos) * 10000.0 + 0.5) / 10000.0 AS cos FROM (
          |  SELECT q_id, c_id, cos,
          |    row_number() OVER (PARTITION BY q_id
          |      ORDER BY cos DESC, c_id ASC) AS rank
          |  FROM scored) r
          |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin),

    "q_sim_knn_label" ->
      (duckCosine("embeddings", "embeddings",
        s"a.vec_id < $nQueries", "a.vec_id <> b.vec_id") +
        """,
          |topk AS (
          |  SELECT q_id, c_id FROM (
          |    SELECT q_id, c_id,
          |      row_number() OVER (PARTITION BY q_id
          |        ORDER BY cos DESC, c_id ASC) AS rank
          |    FROM scored) r
          |  WHERE rank <= 5),
          |votes AS (
          |  SELECT t.q_id, e.label, count(*) AS v
          |  FROM topk t JOIN embeddings e ON e.vec_id = t.c_id
          |  GROUP BY 1, 2)
          |SELECT q_id, CAST(label AS BIGINT) AS pred_label FROM (
          |  SELECT q_id, label,
          |    row_number() OVER (PARTITION BY q_id
          |      ORDER BY v DESC, label ASC) AS rn
          |  FROM votes) f
          |WHERE rn = 1 ORDER BY q_id""".stripMargin),

    "q_mine_hard_negatives" ->
      (duckCosine("embeddings", "embeddings",
        s"a.vec_id < $nQueries", "a.label <> b.label") +
        """
          |SELECT q_id, rank, c_id, floor((cos) * 10000.0 + 0.5) / 10000.0 AS cos FROM (
          |  SELECT q_id, c_id, cos,
          |    row_number() OVER (PARTITION BY q_id
          |      ORDER BY cos DESC, c_id ASC) AS rank
          |  FROM scored) r
          |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin),

    "q_embed_rproject" ->
      // Mirrors Similarity.randomProject exactly: micro-unit longs,
      // md5-first-hex-digit coin (0-7 -> +1) keyed "rp_<seed>_<j>_<i-1>"
      // (i-1: SQL list index is 1-based, the sign key 0-based), exact
      // BIGINT component sums reassembled in j order.
      """WITH dims AS (SELECT unnest(generate_series(1, 64)) AS i),
        |outs AS (SELECT unnest(generate_series(0, 15)) AS j),
        |m AS (
        |  SELECT e.vec_id, d.i,
        |    CAST(floor(CAST(e.embedding[d.i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS mi
        |  FROM embeddings e, dims d
        |  WHERE e.embedding IS NOT NULL),
        |s AS (
        |  SELECT o.j, d.i,
        |    CASE WHEN strpos('01234567',
        |      substring(md5('rp_7_' || o.j || '_' || (d.i - 1)), 1, 1)) > 0
        |    THEN 1 ELSE -1 END AS sgn
        |  FROM outs o, dims d),
        |p AS (
        |  SELECT m.vec_id, s.j, CAST(sum(s.sgn * m.mi) AS BIGINT) AS yj
        |  FROM m JOIN s ON s.i = m.i
        |  GROUP BY 1, 2)
        |SELECT vec_id, CAST(j AS BIGINT) AS j, yj
        |FROM p ORDER BY vec_id, j""".stripMargin,

    "q_pca_moments" ->
      // Mirrors Pca.covMoments exactly: micro-unit longs (the shared
      // floor(x*1e6+0.5) convention), upper-triangle pair sums, and
      // the centered numerator n*s_ij - s_i*s_j — all exact BIGINT
      // at sf0.01 (|mi| < 6e5, n = 500 keeps every product < 2^63).
      """WITH dims AS (SELECT unnest(generate_series(1, 64)) AS i),
        |m AS (
        |  SELECT e.vec_id, d.i,
        |    CAST(floor(CAST(e.embedding[d.i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS mi
        |  FROM embeddings e, dims d
        |  WHERE e.embedding IS NOT NULL),
        |p AS (
        |  SELECT a.i - 1 AS i, b.i - 1 AS j, count(*) AS n,
        |    CAST(sum(a.mi) AS BIGINT) AS s_i,
        |    CAST(sum(b.mi) AS BIGINT) AS s_j,
        |    CAST(sum(a.mi * b.mi) AS BIGINT) AS s_ij
        |  FROM m a JOIN m b ON b.vec_id = a.vec_id AND b.i >= a.i
        |  GROUP BY 1, 2)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, n,
        |  s_i, s_j, s_ij, n * s_ij - s_i * s_j AS cov_num
        |FROM p ORDER BY i, j""".stripMargin,

    "q_dedup_embedding" ->
      (duckCosine("embeddings", "embeddings",
        "TRUE", "a.vec_id < b.vec_id AND b.vec_id - a.vec_id <= 50") +
        """
          |SELECT q_id AS id_a, c_id AS id_b, floor((cos) * 10000.0 + 0.5) / 10000.0 AS cos
          |FROM scored WHERE floor((cos) * 10000.0 + 0.5) / 10000.0 >= 0.35
          |ORDER BY id_a, id_b""".stripMargin),

    "q_embed_quantize" ->
      // Mirrors Similarity.quantizeInt8's integer-exact pipeline:
      // micro-unit longs -> exact integer sum of squares (order-
      // independent) -> single correctly-rounded IEEE divide/multiply
      // per code. See the operator's Scaladoc.
      """WITH dims AS (SELECT unnest(generate_series(1, 64)) AS i),
        |m AS (
        |  SELECT e.vec_id, d.i,
        |    CAST(floor(CAST(e.embedding[d.i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS mi
        |  FROM embeddings e, dims d),
        |n AS (
        |  SELECT vec_id, sqrt(CAST(sum(mi * mi) AS DOUBLE)) AS nrm_micro
        |  FROM m GROUP BY vec_id),
        |q AS (
        |  SELECT m.vec_id, m.i,
        |    CAST(floor(CASE WHEN n.nrm_micro = 0
        |      THEN CAST(m.mi AS DOUBLE) / 1000000.0 * 127.0
        |      ELSE CAST(m.mi AS DOUBLE) * 127.0 / n.nrm_micro END + 0.5) AS BIGINT) AS qi
        |  FROM m JOIN n ON n.vec_id = m.vec_id)
        |SELECT vec_id, CAST(sum(qi) AS BIGINT) AS q_sum, min(qi) AS q_min, max(qi) AS q_max,
        |  max(CASE WHEN i = 1 THEN qi END) AS q_first
        |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q_embed_outliers" ->
      // Micro-unit quantized vectors and midpoint-rounded centroids:
      // every sum is exact BIGINT, the single s/n division is one
      // correctly-rounded IEEE op (see EmbeddingStats Scaladoc).
      """WITH dims AS (SELECT unnest(generate_series(1, 64)) AS i),
        |m AS (
        |  SELECT e.vec_id, e.label, d.i,
        |    CAST(floor(CAST(e.embedding[d.i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS mi
        |  FROM embeddings e, dims d
        |  WHERE e.embedding IS NOT NULL),
        |c AS (
        |  SELECT label, i,
        |    CAST(floor(CAST(sum(mi) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS c
        |  FROM m GROUP BY 1, 2),
        |dist AS (
        |  SELECT m.vec_id, m.label,
        |    CAST(sum((m.mi - c.c) * (m.mi - c.c)) AS BIGINT) AS dist2_micro
        |  FROM m JOIN c ON c.label = m.label AND c.i = m.i
        |  GROUP BY 1, 2)
        |SELECT CAST(label AS BIGINT) AS label, CAST(rank AS BIGINT) AS rank,
        |  vec_id, dist2_micro
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY label
        |    ORDER BY dist2_micro DESC, vec_id ASC) AS rank
        |  FROM dist) r
        |WHERE rank <= 10 ORDER BY label, rank""".stripMargin
  )
}
