package graft.queries

import graft.{QueryFn, Tables, rnd}
import graft.operators.{Dedup, TextAnalysis => TA}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication surface over `documents` (the
  * LLM-training-data-pipeline extensions). Oracle-checked where the
  * computation is expressible in ANSI-ish DuckDB SQL; hash-based
  * operators (minhash, simhash, rolling hash) get rows-only checks and
  * ScalaTest coverage instead.
  */
object TextQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  /** Harness hygiene for the table-building BM25 queries, in ONE
    * place (the table list comes from Retrieval so a layout change
    * cannot miss a cleanup site): a PREVIOUS JVM's run leaves the
    * warehouse directories behind while this session's in-memory
    * catalog is empty, and Spark refuses to CREATE a managed table
    * over an orphaned location — drop both the catalog entries and
    * any stale directories first. */
  private def dropBm25Tables(s: SparkSession, prefix: String): Unit =
    // six independent catalog+fs drops — overlapped (guide §2.6)
    graft.operators.Concurrent.inParallel(
      graft.operators.Retrieval.indexTableNames(prefix).map(t =>
        () => graft.sources.BucketedTables.dropTableAndDir(s, t)))

  private val stopwords = Seq("the", "a", "of", "and", "to")

  // ONE cap shared by q_dedup_simhash_banded and its audit query —
  // tuning the join without the audit following would make the audit
  // report "no recall loss" about a different configuration.
  private val simhashBucketCap = 10000

  // ONE jaccard near-dup configuration shared by q_dedup_ngram_jaccard
  // and q_dedup_clusters — Spark calls AND both oracles interpolate
  // these, so tuning the threshold/gap/df-cap can never desync the
  // cluster query from the pair query it claims to close over.
  private val jaccardThreshold = 0.8
  private val jaccardMaxIdGap = 25L
  private val jaccardDfCapPct = 77

  /** The jaccard pair set both queries build on (one definition). */
  private def jaccardPairsDf(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardPairs(t(s, d, "documents"), "doc_id",
      TA.tokens(col("text")), threshold = jaccardThreshold,
      maxIdGap = Some(jaccardMaxIdGap), dfCapPct = Some(jaccardDfCapPct))

  /** One-row precision verdict for a sketch-family audit: the
    * emitted-pair set `checked` (already joined to its independently
    * recomputed exact metric) folds to
    * `(checked_nonzero, n_violations)`. The matching oracle is the
    * CONSTANT row `(1, 0)` — the exact pair set is not
    * oracle-enumerable (that is WHY these families are sketches), but
    * the no-false-positive contract is still hash-checkable: a pair
    * violating its exact predicate flips n_violations, and an
    * operator that silently emits nothing flips checked_nonzero, so
    * the audit cannot pass vacuously. */
  private def precisionVerdict(checked: DataFrame,
                               violation: org.apache.spark.sql.Column)
  : DataFrame =
    checked.agg(
      (count(lit(1)) > 0).cast("long").as("checked_nonzero"),
      coalesce(sum(when(violation, 1L).otherwise(0L)), lit(0L))
        .as("n_violations"))

  private val precisionOracleSql: String =
    "SELECT CAST(1 AS BIGINT) AS checked_nonzero, " +
      "CAST(0 AS BIGINT) AS n_violations"

  /** Pair-set agreement verdict (round 15): the emitted near-dup
    * pair set must equal an INDEPENDENT recomputation pair for pair,
    * value for value — n_extra / n_missing / n_val_diff fold to 0
    * under the constant oracle. An operator emitting nothing flips
    * n_missing whenever true pairs exist, so the check cannot pass
    * vacuously; checked_nonzero pins that the recomputation's input
    * itself was non-empty. Both frames carry (doc_a, doc_b, valCol).
    *
    * Round 16 (ADVICE): the emitted side is folded per (doc_a, doc_b)
    * BEFORE the full-outer join, so a regression that double-emits a
    * pair is no longer invisible — every emitted duplicate counts
    * into `n_dup_emitted`, and two emissions of the same pair with
    * DIFFERENT values flip `n_val_diff` via the min/max spread even
    * when one of them matches the recomputation.
    */
  private[graft] def pairAgreementVerdict(emitted: DataFrame,
                                          recomputed: DataFrame,
                                          valCol: String,
                                          nonEmpty: DataFrame): DataFrame = {
    val em = emitted.withColumnRenamed(valCol, "v_op")
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_em"),
        min(col("v_op")).as("v_op_min"), max(col("v_op")).as("v_op_max"))
    val agree = em
      .join(recomputed.withColumnRenamed(valCol, "v_re")
          .withColumn("re_seen", lit(1)),
        Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        coalesce(sum(when(col("re_seen").isNull, 1L).otherwise(0L)),
          lit(0L)).as("n_extra"),
        coalesce(sum(when(col("n_em").isNull, 1L).otherwise(0L)),
          lit(0L)).as("n_missing"),
        coalesce(sum(when(col("n_em").isNotNull &&
            col("re_seen").isNotNull &&
            (!(col("v_op_min") <=> col("v_re")) ||
              !(col("v_op_max") <=> col("v_re"))), 1L).otherwise(0L)),
          lit(0L)).as("n_val_diff"),
        coalesce(sum(col("n_em") - 1L), lit(0L)).as("n_dup_emitted"))
    nonEmpty.agg((count(lit(1)) > 0).cast("long").as("checked_nonzero"))
      .crossJoin(agree)
  }

  private val agreementOracleSql: String =
    "SELECT CAST(1 AS BIGINT) AS checked_nonzero, " +
      "CAST(0 AS BIGINT) AS n_extra, " +
      "CAST(0 AS BIGINT) AS n_missing, " +
      "CAST(0 AS BIGINT) AS n_val_diff, " +
      "CAST(0 AS BIGINT) AS n_dup_emitted"

  /** Reference BPE encode for the q_bpe_tokencount agreement row: a
    * plain Scala merge fold — codepoint split (surrogate-pair aware),
    * then one non-overlapping left-to-right pass per merge in rank
    * order — deliberately NOT routed through
    * [[graft.functions.BpeKernels]], so the oracle-side recomputation
    * shares no code with the codegen expression it audits. Driver-side
    * by design: it runs once per DISTINCT word (vocab-sized, the
    * Bpe.DriverTrainMaxWords stance). Returns the piece count. */
  private def bpeFoldReference(w: String,
                               merges: Seq[(String, String)]): Long = {
    var syms: Vector[String] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        buf += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      buf.toVector
    }
    merges.foreach { case (l, r) =>
      if (syms.length >= 2) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += l + r; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toVector
      }
    }
    syms.length.toLong
  }

  /** Band-exactness agreement verdict (round 15): compare an
    * operator's banded near-dup pair set against an INDEPENDENT
    * straightforward recomputation — plain shift/mask 4x16-bit band
    * arithmetic over `fp` (an (doc, fp) frame from a fresh scan),
    * DOC-granularity band self-join at the SAME census cap,
    * bit_count(xor) hamming — which is exactly the set the pigeonhole
    * contract promises for maxHamming <= 3. */
  private def bandedAgreementVerdict(emitted: DataFrame,
                                     fp: DataFrame,
                                     bucketCap: Int): DataFrame = {
    val banded = fp.select(col("doc"), col("fp"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("fp"), b * 16)
              .bitwiseAND(lit(0xFFFFL)).as("bits"))): _*)).as("bb"))
      .select(col("doc"), col("fp"),
        col("bb.band").as("band"), col("bb.bits").as("bits"))
    val hot = banded.groupBy("band", "bits")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > bucketCap)
      .select("band", "bits")
    val kept = banded.join(hot, Seq("band", "bits"), "left_anti")
    val recomputed = kept.select(col("band"), col("bits"),
        col("doc").as("doc_a"), col("fp").as("fp_a"))
      .join(kept.select(col("band"), col("bits"),
        col("doc").as("doc_b"), col("fp").as("fp_b")),
        Seq("band", "bits"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b")))
          .cast("long").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= 3)
    pairAgreementVerdict(emitted, recomputed, "hamming", fp)
  }

  /** Rounded jaccard over the `inter`/`sizes` CTEs below — appears in
    * both the SELECT and the threshold WHERE of each oracle. */
  private val jaccardSqlExpr =
    "floor((CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE)) " +
      "* 10000.0 + 0.5) / 10000.0"

  /** The oracle CTE chain mirroring [[jaccardPairsDf]] step by step —
    * shared verbatim by the pair and cluster oracles. */
  private def jaccardSqlCtes: String =
    s"""tok0 AS (
       |  SELECT DISTINCT doc, token FROM (
       |    SELECT doc_id AS doc, unnest(string_split(lower(text), ' ')) AS token
       |    FROM documents) raw),
       |hot AS (SELECT token FROM tok0 GROUP BY token
       |        HAVING count(*) * 100 > $jaccardDfCapPct * (SELECT count(DISTINCT doc) FROM tok0)),
       |tok AS (SELECT * FROM tok0 WHERE token NOT IN (SELECT token FROM hot)),
       |sizes AS (SELECT doc, count(*) AS n FROM tok GROUP BY doc),
       |inter AS (
       |  -- block-banded form of the gap-bounded token self-join (the
       |  -- same banding the Spark side uses): 0 < b.doc - a.doc <= g
       |  -- implies b's block is a's or the next one, so replicating a
       |  -- into (blk, blk+1) makes the join EQUI on (token, blk) and
       |  -- each qualifying row pair matches exactly once — identical
       |  -- result, but per-key work is bounded by 2 blocks of g docs
       |  -- instead of a token's full document frequency squared
       |  SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS i
       |  FROM (SELECT doc, token, doc // $jaccardMaxIdGap AS blk FROM tok
       |        UNION ALL
       |        SELECT doc, token, doc // $jaccardMaxIdGap + 1 AS blk FROM tok) a
       |  JOIN (SELECT doc, token, doc // $jaccardMaxIdGap AS blk FROM tok) b
       |    ON a.token = b.token AND a.blk = b.blk
       |    AND a.doc < b.doc AND b.doc - a.doc <= $jaccardMaxIdGap
       |  GROUP BY 1, 2)""".stripMargin

  // ONE chunk geometry shared by q_text_chunk and q_pack_sequences —
  // the packing query packs EXACTLY the chunks the chunk query emits,
  // and both oracles interpolate the same constants (same
  // desync-proofing as the span/substring constants below).
  private val chunkTokensN = 6
  private val chunkOverlapN = 2
  private val chunkStrideN = chunkTokensN - chunkOverlapN

  /** The chunk CTE chain mirroring `Chunking.chunkDocs` — shared by
    * the q_text_chunk and q_pack_sequences oracles. */
  private def chunkSqlCtes: String =
    s"""t AS (
       |  SELECT doc_id, string_split(lower(coalesce(text, '')), ' ') AS toks
       |  FROM documents),
       |starts AS (
       |  SELECT doc_id, toks,
       |    unnest(generate_series(1, greatest(len(toks) - $chunkOverlapN, 1), $chunkStrideN)) AS s
       |  FROM t),
       |c AS (
       |  SELECT doc_id,
       |    CAST((s - 1) // $chunkStrideN AS BIGINT) AS chunk_idx,
       |    array_to_string(list_slice(toks, s, s + ${chunkTokensN - 1}), ' ') AS chunk
       |  FROM starts)""".stripMargin

  /** Permutation-dup clusters (id, root) shared by q_dedup_canonical
    * and q_split_leakproof: root = min doc_id per order-insensitive
    * content fingerprint. One definition so the two queries can never
    * disagree about what a cluster is. */
  private def fingerprintClusters(docs: DataFrame): DataFrame = {
    val fp = TA.contentFingerprint(TA.tokens(col("text")))
    // window min over fp, not a self-join: ONE scan/tokenize pass
    // (the self-join form fingerprinted the corpus twice); fp groups
    // are cluster-sized, so the window partitioning is bounded
    docs.select(col("doc_id").as("id"), fp.as("fp"))
      .withColumn("root", min("id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .select("id", "root")
  }

  /** Training set shared by q_text_quality_fit and its distill/apply
    * twin: per-doc Q4 heuristic features joined with the bigram-LM
    * target in centi-nat units. Everything is INTEGER arithmetic so
    * fit and oracle agree bit-for-bit: the stopword feature uses the
    * integer round-half-up form `(20000·n_stop + n_tok) div (2·n_tok)`
    * (not the float path — exactness of the downstream Cramer solve
    * starts at exact inputs), and the target truncates `lp_q4 div
    * (n_big·100)` identically in Spark (`div`) and DuckDB (`//`). */
  private def qualityFitTrainSet(s: SparkSession, d: String): DataFrame = {
    val toks = TA.tokens(col("text"))
    val y = graft.operators.LanguageModel
      .bigramScore(t(s, d, "documents"), "doc_id", TA.tokens(col("text")))
      .select(col("doc").as("doc_id"),
        expr("lp_micro div (n_big * 100)").as("y"))
    t(s, d, "documents")
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tok"),
        size(filter(toks, x => x.isin(stopwords.map(lit): _*)))
          .cast("long").as("n_stop"))
      .select(col("doc_id"),
        expr("(n_stop * 20000 + n_tok) div (2 * n_tok)").as("f_stop"),
        (least(col("n_tok"), lit(100L)) * lit(100L)).as("f_len"))
      .join(y, "doc_id")
  }

  // ONE span-size definition shared by the q_dedup_spans Spark call
  // AND its DuckDB oracle (the SQL interpolates these, so changing
  // spanTokens here can never desync the oracle's breakpoint modulus
  // or sub-tile cap). Sub-tile cap mirrors stripRepeatedSpans's
  // default of 4 * spanTokens.
  private val dedupSpanTokens = 2
  private val dedupSpanSubCap = 4 * dedupSpanTokens
  // q_dedup_substring: ONE definition feeds the Spark call AND its
  // DuckDB oracle (same desync-proofing as the span constants above)
  private val substringShingleK = 8
  private val substringMinTokens = 20
  private val substringDfPermille = 50
  private val substringOccCap = 10000
  // the island CTE chain both substring oracles build on — mirrors
  // Dedup.sharedPassages step by step (shingle, df cap, diagonal
  // gaps-and-islands); defined once so the find and strip oracles
  // cannot desync
  private def substringIslandsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS t
       |  FROM documents),
       |sh0 AS (
       |  SELECT doc_id AS doc, i - 1 AS pos,
       |    md5(list_aggregate(t[i:i+${substringShingleK - 1}], 'string_agg', ' ')) AS sh
       |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - ${substringShingleK - 1})) AS i) s
       |  WHERE len(t) >= $substringShingleK),
       |hot AS (
       |  SELECT sh FROM sh0 GROUP BY sh
       |  HAVING count(DISTINCT doc) * 1000 >
       |      $substringDfPermille * (SELECT count(DISTINCT doc) FROM sh0)
       |    OR count(*) > $substringOccCap),
       |shc AS (SELECT * FROM sh0 WHERE sh NOT IN (SELECT sh FROM hot)),
       |m AS (
       |  SELECT a.doc AS doc_a, b.doc AS doc_b, a.pos AS pa, b.pos AS pb,
       |    a.pos - b.pos AS diag
       |  FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc < b.doc),
       |runs AS (
       |  SELECT doc_a, doc_b, diag, pa,
       |    pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag
       |      ORDER BY pa) AS grp
       |  FROM m),
       |isl AS (
       |  SELECT doc_a, doc_b, diag, grp, min(pa) AS a_start,
       |    max(pa) - min(pa) + $substringShingleK AS len_tokens
       |  FROM runs GROUP BY 1, 2, 3, 4)""".stripMargin

  val queries: Map[String, QueryFn] = Map(

    "q_text_tokenize" -> ((s, d) => {
      t(s, d, "documents")
        .select(explode(TA.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy("token")
    }),

    "q_text_ngrams" -> ((s, d) => {
      t(s, d, "documents")
        .select(explode(TA.bigrams(TA.tokens(col("text")))).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("cnt"))
        .orderBy("bigram")
    }),

    "q_text_stats" -> ((s, d) => {
      val toks = TA.tokens(col("text"))
      t(s, d, "documents").select(
        col("doc_id"),
        length(col("text")).cast("long").as("chars"),
        size(toks).cast("long").as("n_tok"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        rnd((length(col("text")) - (size(toks) - 1))
          .cast("double") / size(toks).cast("double"), 4).as("avg_tok_len"))
        .orderBy("doc_id")
    }),

    "q_text_langid" -> ((s, d) => {
      t(s, d, "documents").select(
        col("doc_id"),
        TA.langIdHeuristic(col("text")).as("pred_lang"),
        col("lang"),
        // correct = false whenever EITHER side is null (a null
        // ground-truth lang is "not correct"; ditto a null
        // prediction, should the heuristic ever emit one) — coalesce
        // makes that explicit instead of leaning on <=>, whose
        // NULL<=>NULL = true would silently flip the semantics
        coalesce(TA.langIdHeuristic(col("text")) === col("lang"),
          lit(false)).as("correct"))
        .orderBy("doc_id")
    }),

    "q_text_quality" -> ((s, d) => {
      val toks = TA.tokens(col("text"))
      t(s, d, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("words"),
        rnd(TA.stopwordRatio(toks, stopwords), 4).as("stop_ratio"),
        TA.qualityScore(col("text"), toks, stopwords).as("score"))
        .orderBy("doc_id")
    }),

    "q_text_tokencount" -> ((s, d) => {
      t(s, d, "documents").select(
        col("doc_id"),
        size(TA.tokens(col("text"))).cast("long").as("n_ws"),
        TA.bpeTokenCount(col("text")).cast("long").as("n_bpe"))
        .orderBy("doc_id")
    }),

    "q_text_fingerprint" -> ((s, d) => {
      t(s, d, "documents").select(
        col("doc_id"),
        TA.contentFingerprint(TA.tokens(col("text"))).as("fp"))
        .orderBy("doc_id")
    }),

    "q_dedup_exact" -> ((s, d) => {
      Dedup.exactGroups(t(s, d, "documents"), "doc_id", "text")
        .select(col("keep_id"), col("n_docs"), col("digest"))
        .orderBy("keep_id")
    }),

    "q_dedup_spans" -> ((s, d) => {
      // Corpus-level boilerplate strip with CONTENT-DEFINED span
      // boundaries (break after sentence delimiters or when the
      // token's md5 hex tail ≡ 0 mod spanTokens): spans occurring in
      // >1% of documents are removed from every document, and the
      // same boilerplate chunks identically at ANY token offset —
      // phase-shifted nav bars can't hide the way they could from
      // fixed-offset tiles. clean_text preserves original casing;
      // matching stays case-insensitive. Threshold is integer-exact
      // permille so the cut is scale-invariant and oracle-reproducible.
      Dedup.stripRepeatedSpans(t(s, d, "documents"), "doc_id", "text",
          spanTokens = dedupSpanTokens, maxDocFreqPermille = 10)
        .orderBy("doc_id")
    }),

    "q_dedup_substring" -> ((s, d) => {
      // Duplicated-PASSAGE detection (Lee et al. substring dedup):
      // maximal runs of >= 20 verbatim tokens shared by as few as TWO
      // docs — the dedup family q_dedup_spans' corpus-frequency
      // threshold cannot see. k=8 shingles, md5 keys, 50-permille df
      // cap (never binding at sf0.01 — max shingle df is 3 docs —
      // pure scale insurance mirrored by the oracle).
      Dedup.sharedPassages(t(s, d, "documents"), "doc_id",
          TA.tokens(col("text")), k = substringShingleK,
          minTokens = substringMinTokens,
          maxDocFreqPermille = substringDfPermille,
          maxShingleOccurrences = substringOccCap)
        .orderBy("doc_a", "doc_b", "a_start", "b_start")
    }),

    "q_dedup_substring_strip" -> ((s, d) => {
      // The APPLY half: every shared passage is cut from the
      // higher-id doc of its pair (union of intervals per victim),
      // original casing preserved — one row per document.
      Dedup.stripSharedPassages(t(s, d, "documents"), "doc_id", "text",
          k = substringShingleK, minTokens = substringMinTokens,
          maxDocFreqPermille = substringDfPermille,
          maxShingleOccurrences = substringOccCap)
        .orderBy("doc_id")
    }),

    "q_dedup_ngram_jaccard" -> ((s, d) => {
      // dfCapPct: tokens present in more of the corpus than the cap
      // are stopwords for near-dup purposes — dropping them shrinks
      // the inverted-index join ~3x and removes its hottest keys (the
      // percent form stays meaningful at any scale factor; the oracle
      // mirrors the cut). Configuration lives in the shared jaccard*
      // constants so q_dedup_clusters can never drift from this.
      jaccardPairsDf(s, d).orderBy("doc_a", "doc_b")
    }),

    "q_dedup_clusters" -> ((s, d) => {
      // Transitive closure of the jaccard near-dup pairs (the SAME
      // pair set as q_dedup_ngram_jaccard — shared definition): every
      // doc in a duplicate cluster mapped to the cluster's min id
      // (the canonical survivor) — the step that turns pair lists
      // into an actual keep/drop decision.
      Dedup.connectedComponents(jaccardPairsDf(s, d), "doc_a", "doc_b")
        .select(col("node").as("doc"), col("root"))
        .orderBy("doc")
    }),

    "q_minhash_neardup" -> ((s, d) => {
      // Round 15: ORACLE-CHECKED agreement row (was rows-only pairs).
      // The independent recomputation shares exactly ONE primitive —
      // the banded-signature kernel, whose hash seeds define the
      // signature space — and rebuilds every downstream stage on its
      // own (plain posexplode banding, its own census at the same
      // cap, plain equi-joins, exact-jaccard verification on a fresh
      // shingle scan). The operator's persist/factoring machinery
      // must reproduce that set pair for pair, jaccard for jaccard.
      val docs = t(s, d, "documents")
      val emitted = Dedup.minhashNearDups(docs, "doc_id",
        TA.shingles(TA.tokens(col("text")), 3), threshold = 0.7)
      val sh = docs.select(col("doc_id").as("doc"),
          array_distinct(TA.shingles(TA.tokens(col("text")), 3))
            .as("sh"))
        .filter(size(col("sh")) > 0)
      val banded = sh.select(col("doc"),
        posexplode(Dedup.minhashBands(col("sh"), 8, 4))
          .as(Seq("band", "bh")))
      val hot = banded.groupBy("band", "bh")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 200).select("band", "bh")
      val kept = banded.join(hot, Seq("band", "bh"), "left_anti")
      val recomputed = kept
        .select(col("band"), col("bh"), col("doc").as("doc_a"))
        .join(kept.select(col("band"), col("bh"),
          col("doc").as("doc_b")), Seq("band", "bh"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").dropDuplicates("doc_a", "doc_b")
        .join(sh.select(col("doc").as("doc_a"), col("sh").as("sh_a")),
          "doc_a")
        .join(sh.select(col("doc").as("doc_b"), col("sh").as("sh_b")),
          "doc_b")
        .select(col("doc_a"), col("doc_b"), rnd(
          size(array_intersect(col("sh_a"), col("sh_b")))
            .cast("double") /
            size(array_union(col("sh_a"), col("sh_b")))
              .cast("double"), 4).as("jaccard"))
        .filter(col("jaccard") >= 0.7)
      pairAgreementVerdict(emitted, recomputed, "jaccard", sh)
    }),

    "q_dedup_simhash" -> ((s, d) => {
      // Round 15: ORACLE-CHECKED agreement row (was rows-only pairs).
      // The windowed pairing recomputed independently: fresh
      // fingerprints, the OPPOSITE block-grid direction (the operator
      // explodes the right side into {blk, blk-1}; the twin explodes
      // the left into {blk, blk+1}), plain window filter,
      // bit_count(xor) hamming <= 12.
      val docs = t(s, d, "documents")
      val emitted = Dedup.simhashNearDups(docs, "doc_id",
        TA.tokens(col("text")), maxHamming = 12, maxIdGap = 25L)
      val gap = 25L
      val fp = docs.select(col("doc_id").as("doc"),
        Dedup.simhash64(TA.tokens(col("text"))).as("fp"))
      val blocked = fp.withColumn("blk", floor(col("doc") / gap))
      val recomputed = blocked
        .select(col("doc").as("doc_a"), col("fp").as("fp_a"),
          explode(array(col("blk"), col("blk") + 1)).as("jb"))
        .join(blocked.select(col("doc").as("doc_b"),
          col("fp").as("fp_b"), col("blk").as("jb")), "jb")
        .filter(col("doc_a") < col("doc_b") &&
          col("doc_b") - col("doc_a") <= gap)
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("fp_a").bitwiseXOR(col("fp_b")))
            .cast("long").as("hamming"))
        .filter(col("hamming") <= 12)
      pairAgreementVerdict(emitted, recomputed, "hamming", fp)
    }),

    "q_dedup_simhash_banded" -> ((s, d) => {
      // Unbounded (whole-corpus) simhash near-dup via 4x16-bit band
      // buckets — exact for maxHamming <= 3 by pigeonhole, no id
      // window, no all-pairs anywhere. Round 15: ORACLE-CHECKED
      // verdict row (was rows-only pairs) — band-exactness as an
      // exact-integer agreement row: the operator's factored pair set
      // (hamming-0 fast path + distinct-fingerprint banded join +
      // census cap, the r9 machinery) is compared pair for pair
      // against an INDEPENDENT straightforward recomputation — fresh
      // scan, plain shift/mask band arithmetic, DOC-granularity band
      // self-join at the SAME cap, bit_count(xor) hamming — which is
      // exactly the set the pigeonhole contract promises. n_extra /
      // n_missing / n_ham_diff must all be 0 (the constant oracle
      // pins them; an operator emitting nothing flips n_missing
      // whenever true pairs exist, so the check cannot pass
      // vacuously). Precision/recall twins stay
      // q_dedup_simhash_banded_precision / q_dedup_simhash_audit.
      val docs = t(s, d, "documents")
      bandedAgreementVerdict(
        Dedup.simhashNearDupsBanded(docs, "doc_id",
          TA.tokens(col("text")), maxHamming = 3,
          bucketCap = simhashBucketCap),
        docs.select(col("doc_id").as("doc"),
          Dedup.simhash64(TA.tokens(col("text"))).as("fp")),
        simhashBucketCap)
    }),

    "q_minhash_precision" -> ((s, d) => {
      // Precision twin for q_minhash_neardup (rows-only by design):
      // every emitted pair's exact 3-shingle Jaccard is recomputed
      // through a FRESH documents scan + plain id equi-joins — none
      // of the operator's signature/band/bucket machinery — and must
      // clear the same threshold. rnd() is floor-form, so an emitted
      // jaccard >= 0.7 implies the unrounded exact value is too.
      val docs = t(s, d, "documents")
      val sh = docs.select(col("doc_id"),
        array_distinct(TA.shingles(TA.tokens(col("text")), 3)).as("sh"))
      val pairs = Dedup.minhashNearDups(docs, "doc_id",
        TA.shingles(TA.tokens(col("text")), 3), threshold = 0.7)
      val checked = pairs
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
          "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
          "doc_b")
        .withColumn("exact",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      precisionVerdict(checked,
        col("exact") < 0.7 || col("doc_a") >= col("doc_b"))
    }),

    "q_dedup_simhash_precision" -> ((s, d) => {
      // Precision twin for q_dedup_simhash: emitted (doc_a, doc_b,
      // hamming) re-verified against fingerprints recomputed on a
      // fresh scan — reported hamming must equal bit_count(xor) of
      // the recomputed fingerprints, clear maxHamming, and respect
      // the id-gap window the operator claims.
      val docs = t(s, d, "documents")
      val fp = docs.select(col("doc_id"),
        Dedup.simhash64(TA.tokens(col("text"))).as("fp"))
      val pairs = Dedup.simhashNearDups(docs, "doc_id",
        TA.tokens(col("text")), maxHamming = 12, maxIdGap = 25L)
      val checked = pairs
        .join(fp.select(col("doc_id").as("doc_a"), col("fp").as("fp_a")),
          "doc_a")
        .join(fp.select(col("doc_id").as("doc_b"), col("fp").as("fp_b")),
          "doc_b")
        .withColumn("exact_ham",
          bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
      precisionVerdict(checked,
        col("exact_ham") =!= col("hamming") || col("exact_ham") > 12 ||
          col("doc_b") - col("doc_a") > 25L ||
          col("doc_a") >= col("doc_b"))
    }),

    "q_dedup_simhash_banded_precision" -> ((s, d) => {
      // Precision twin for q_dedup_simhash_banded at the SAME
      // bucketCap: the banded/factored join may MISS pairs (recall —
      // audited by q_dedup_simhash_audit) but every pair it emits
      // must be a true hamming <= 3 pair of the recomputed
      // fingerprints.
      val docs = t(s, d, "documents")
      val fp = docs.select(col("doc_id"),
        Dedup.simhash64(TA.tokens(col("text"))).as("fp"))
      val pairs = Dedup.simhashNearDupsBanded(docs, "doc_id",
        TA.tokens(col("text")), maxHamming = 3,
        bucketCap = simhashBucketCap)
      val checked = pairs
        .join(fp.select(col("doc_id").as("doc_a"), col("fp").as("fp_a")),
          "doc_a")
        .join(fp.select(col("doc_id").as("doc_b"), col("fp").as("fp_b")),
          "doc_b")
        .withColumn("exact_ham",
          bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
      precisionVerdict(checked,
        col("exact_ham") =!= col("hamming") || col("exact_ham") > 3 ||
          col("doc_a") >= col("doc_b"))
    }),

    "q_dedup_simhash_audit" -> ((s, d) => {
      // Round 16: ORACLE-CHECKED census agreement row (was the
      // rows-only dropped-bucket listing, which is EMPTY at every
      // shipped SF — a vacuous check). The operator's skew census
      // (Dedup.simhashDroppedBuckets — the same machinery the banded
      // join's recall guard runs) is recomputed INDEPENDENTLY: fresh
      // documents scan, plain shift/mask 4x16-bit band arithmetic, a
      // plain groupBy histogram — and compared bucket for bucket at
      // cap = 0, i.e. over the FULL (band, bits) -> size histogram.
      // Full-histogram agreement subsumes agreement of EVERY
      // threshold's over-cap census, including the shipped
      // simhashBucketCap's (the filter is a monotone cut of this
      // histogram), so the audit now checks the census arithmetic on
      // every bucket instead of hash-matching an empty listing.
      // checked_nonzero pins a non-empty corpus; the shipped-cap
      // dropped-bucket LISTING stays available to operators via
      // Dedup.simhashDroppedBuckets directly.
      val docs = t(s, d, "documents")
      // NULL-text docs carry a NULL fingerprint; both censuses group
      // them into one (band, NULL) bucket per band, but NULL keys
      // never MATCH across the full-outer join — canonicalize the
      // NULL bucket to -1 (outside the 0..65535 bits range)
      // symmetrically on both sides so those buckets are compared
      // size for size like any other.
      val emitted = Dedup.simhashDroppedBuckets(docs, "doc_id",
          TA.tokens(col("text")), bucketCap = 0)
        .withColumn("bits", coalesce(col("bits"), lit(-1L)))
      val fp = docs.select(col("doc_id").as("doc"),
        Dedup.simhash64(TA.tokens(col("text"))).as("fp"))
      val re = fp.select(explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("fp"), b * 16)
              .bitwiseAND(lit(0xFFFFL)).as("bits"))): _*)).as("bb"))
        .groupBy(col("bb.band").as("band"),
          coalesce(col("bb.bits"), lit(-1L)).as("bits"))
        .agg(count(lit(1)).as("bsz_re"))
      val agree = emitted.join(re, Seq("band", "bits"), "full_outer")
        .agg(
          coalesce(sum(when(col("bsz_re").isNull, 1L).otherwise(0L)),
            lit(0L)).as("n_extra"),
          coalesce(sum(when(col("bsz").isNull, 1L).otherwise(0L)),
            lit(0L)).as("n_missing"),
          coalesce(sum(when(col("bsz").isNotNull &&
              col("bsz_re").isNotNull &&
              col("bsz") =!= col("bsz_re"), 1L).otherwise(0L)),
            lit(0L)).as("n_size_diff"))
      fp.agg((count(lit(1)) > 0).cast("long").as("checked_nonzero"))
        .crossJoin(agree)
    }),

    "q_text_redact" -> ((s, d) => {
      t(s, d, "events").select(
        col("event_id"),
        TA.redact(col("props")).as("props_redacted"))
        .orderBy("event_id")
    }),

    "q_split_train_test" -> ((s, d) => {
      graft.operators.DataSplit
        .withSplit(t(s, d, "documents"), "doc_id")
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"))
        .orderBy("split")
    }),

    "q_text_nfc" -> ((s, d) => {
      // Unicode NFC normalization (native graft_nfc expression): the
      // corpus is ASCII, so a decomposed suffix (e + combining acute,
      // angstrom sign) is appended to prove real composition happens
      // — NFC shortens 'cafe'+U+0301 to 'café' in both engines.
      graft.functions.GraftFunctions.register(s)
      // coalesce: NULL text would null the whole concat and emit a
      // NULL `changed` verdict (engine stance: NULL text = empty doc)
      val raw = concat(coalesce(col("text"), lit("")),
        lit(" cafe\u0301 \u212B"))
      t(s, d, "documents").select(
        col("doc_id"),
        call_function("graft_nfc", raw).as("norm_text"),
        (length(call_function("graft_nfc", raw)) =!= length(raw))
          .as("changed"))
        .orderBy("doc_id")
    }),

    "q_text_pipeline" -> ((s, d) => {
      // The composed cleaning pipeline a training-data user actually
      // runs: language filter -> quality filter -> PII redaction ->
      // exact dedup of the cleaned text, in ONE declarative plan (one
      // corpus scan; Catalyst fuses the scalar stages into a single
      // codegen'd projection before the dedup shuffle).
      val toks = TA.tokens(col("text"))
      val staged = t(s, d, "documents").select(
        col("doc_id"),
        TA.langIdHeuristic(col("text")).as("pred_lang"),
        TA.qualityScore(col("text"), toks, stopwords).as("score"),
        TA.redact(col("text")).as("clean"))
        .filter(col("pred_lang") === "en" && col("score") >= 0.5)
      Dedup.exactGroups(staged, "doc_id", "clean")
        .select(col("keep_id"), col("n_docs"), col("digest"))
        .orderBy("keep_id")
    }),

    "q_text_chunk" -> ((s, d) => {
      // chunkTokensN-token chunks with chunkOverlapN-token overlap —
      // the sequence-packing precursor; chunk_idx orders chunks
      // within a doc for deterministic downstream packing. Geometry
      // lives in the shared chunk* constants so q_pack_sequences
      // packs EXACTLY these chunks.
      graft.operators.Chunking
        .chunkDocs(t(s, d, "documents")
            .withColumn("text", coalesce(col("text"), lit(""))),
          "doc_id", "text",
          chunkTokens = chunkTokensN, overlap = chunkOverlapN)
        .orderBy("doc_id", "chunk_idx")
    }),

    "q_text_quality_model" -> ((s, d) => {
      // Model-APPLY quality filter: fastText-style fixed-weight linear
      // classifier over heuristic features — stopword ratio and length
      // saturation vote FOR a document, 2-gram repetition and the
      // too-short indicator vote AGAINST. Q4 features × Q4 literal
      // weights → exact Q8 integer score; `keep` thresholds the
      // integer (0.45), so the decision is engine-exact. Map-only:
      // one corpus scan, one codegen projection, no shuffle before
      // the final order. NULL text = empty doc (scores as a 1-token
      // too-short document, not a NULL keep verdict).
      val toks = TA.tokens(coalesce(col("text"), lit("")))
      def q4(c: org.apache.spark.sql.Column) =
        floor(c * 10000.0d + 0.5d).cast("long")
      val g2 = TA.shingles(toks, 2)
      val stopQ4 = q4(TA.stopwordRatio(toks, stopwords))
      val repQ4 = q4(when(size(g2) === 0, lit(0.0d))
        .otherwise(lit(1.0d) -
          size(array_distinct(g2)).cast("double") /
            size(g2).cast("double")))
      val lenSatQ4 = q4(least(size(toks), lit(100)).cast("double") / 100.0d)
      val shortQ4 = when(size(toks) < 20, lit(10000L)).otherwise(lit(0L))
      val scoreQ8 = TA.linearModelQ8(Seq(
          (stopQ4, 8000L), (repQ4, -12000L),
          (lenSatQ4, 6000L), (shortQ4, -5000L)),
        biasQ8 = 20000000L)
      t(s, d, "documents").select(col("doc_id"),
          (scoreQ8.cast("double") / 1e8).as("score"),
          (scoreQ8 >= lit(45000000L)).as("keep"))
        .orderBy("doc_id")
    }),

    "q_text_quality_fit" -> ((s, d) => {
      // Model-TRAIN twin of q_text_quality_model: fit the linear
      // quality filter's weights FROM data instead of freezing them by
      // hand — OLS of the expensive signal (per-doc avg bigram-LM
      // log-prob, centi-nat units, exact integer) on the two cheap Q4
      // heuristic features, via exact integer normal equations + a
      // driver-side BigInt Cramer solve (ModelFit scaladoc). One corpus
      // scan reduces to 9 BIGINT moments; the artifact row carries the
      // moments (auditable, oracle-checked) and the fitted Q4 weights
      // (deployable through TA.linearModelQ8). Docs with < 2 tokens
      // have no LM target and are absent from the fit (the
      // q_text_lm_bigram inner-join stance).
      graft.operators.ModelFit.fitLinearQ4(
        qualityFitTrainSet(s, d),
        Seq("f_stop" -> col("f_stop"), "f_len" -> col("f_len")),
        col("y"))
    }),

    "q_text_quality_distill" -> ((s, d) => {
      // The fit DEPLOYED: the weights solved by q_text_quality_fit are
      // literalized into a map-only linearModelQ8 projection (the
      // k-means literal-centroid stance — train once at plan time,
      // apply as a scan), scoring every trainable doc and carrying the
      // exact integer residual vs the true LM signal. pred/resid are
      // in centi-nat × Q4 units; every column is engine-exact BIGINT.
      // Persisted: the fit's moment pass and the scoring scan are two
      // actions over the same doc-sized 5-column frame — without the
      // cache the full bigram-LM pipeline runs twice (measured 2x).
      val train = qualityFitTrainSet(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val w = graft.operators.ModelFit.fitWeightsQ4(
        train,
        Seq("f_stop" -> col("f_stop"), "f_len" -> col("f_len")),
        col("y"))
      train.select(col("doc_id"), col("f_stop"), col("f_len"), col("y"),
          TA.linearModelQ8(
            Seq((col("f_stop"), w(1)), (col("f_len"), w(2))),
            biasQ8 = w(0)).as("pred"))
        .withColumn("resid", col("pred") - col("y") * lit(10000L))
        .orderBy("doc_id")
    }),

    "q_text_repetition" -> ((s, d) => {
      // Duplicate n-gram ratios (1 - distinct/total) — the standard
      // boilerplate/repetition quality signal next to q_text_quality;
      // pure codegen array expressions, one corpus scan, no shuffle
      // before the final order.
      // NULL text = empty document (engine stance): unguarded, Spark
      // null-propagates the ratio while the oracle's CASE lands 0.0
      val toks = TA.tokens(coalesce(col("text"), lit("")))
      def dupRatio(n: Int) = {
        val g = TA.shingles(toks, n)
        when(size(g) === 0, lit(0.0d))
          .otherwise(rnd(lit(1.0d) -
            size(array_distinct(g)).cast("double") /
              size(g).cast("double"), 4))
      }
      t(s, d, "documents").select(col("doc_id"),
          dupRatio(2).as("dup_2gram"), dupRatio(3).as("dup_3gram"))
        .orderBy("doc_id")
    }),

    "q_mix_temperature" -> ((s, d) => {
      // Temperature rebalancing at τ=2 over `lang` (en is ~2.2× the
      // next language in the test corpus): q_s ∝ sqrt(p_s) epochs —
      // dominant strata downsampled, rare ones upsampled, expected
      // output ≈ corpus size. Weights are derived from the data
      // declaratively (no driver state), integer-exact end-to-end.
      graft.operators.Mixing.mixTemperature(
          t(s, d, "documents").select("doc_id", "lang"),
          "doc_id", "lang", maxEpochs = 16)
        .select(col("doc_id"), col("lang"), col("copy"))
        .orderBy("doc_id", "copy")
    }),

    "q_dedup_matrix" -> ((s, d) => {
      // Cross-source duplication provenance: duplicate doc pairs and
      // shared digests per source pair — which sources copy from whom.
      // Keyed on the order-insensitive content fingerprint (the test
      // corpus has permutation dups at every SF; byte-identical dups
      // only appear at sf0.1+, which would leave the sf0.01 oracle
      // check vacuous).
      Dedup.crossSourceMatrix(t(s, d, "documents"), "doc_id",
          TA.contentFingerprint(TA.tokens(col("text"))), "source")
        // NULL source is a first-class stratum; pin its placement
        // (Spark asc = NULLS FIRST, DuckDB = NULLS LAST by default)
        .orderBy(col("src_a").asc_nulls_first,
          col("src_b").asc_nulls_first)
    }),

    "q_dedup_canonical" -> ((s, d) => {
      // Representative selection AFTER duplicate detection: per
      // cluster, keep the member with the HIGHEST heuristic quality
      // (ties to lowest id), not "lowest id" — dropping the
      // better-written copy of a near-dup pair is the wrong default
      // for training data. Clusters keyed on the order-insensitive
      // fingerprint (non-vacuous groups at every SF, and
      // oracle-expressible where minhash clusters are not); the
      // operator itself consumes any (id, root) table, e.g.
      // connectedComponents output.
      val docs = t(s, d, "documents")
      graft.operators.Curation.canonicalPerCluster(docs, "doc_id",
          fingerprintClusters(docs),
          TA.qualityScoreQ4(TA.tokens(col("text")), stopwords))
        .select(col("doc_id"), col("root"), col("prio"), col("keep"))
        .orderBy("doc_id")
    }),

    "q_split_leakproof" -> ((s, d) => {
      // Duplicate-aware train/val/test split: the label hashes the
      // cluster ROOT, so permutation-dups of a training doc can never
      // land in val/test — the eval-leakage failure mode an id-hashed
      // split has on an un-deduped corpus. Singletons degenerate to
      // the plain q_split_train_test assignment exactly.
      val docs = t(s, d, "documents")
      graft.operators.Curation
        .leakproofSplit(docs, "doc_id", fingerprintClusters(docs))
        .select(col("doc_id"), col("root"), col("split"))
        .orderBy("doc_id")
    }),

    "q_corpus_drift" -> ((s, d) => {
      // Pairwise source drift: exact total-variation permille between
      // every two sources over the token-count histogram (div-32
      // buckets capped at 63) — the distribution-shift monitor that
      // tells a pipeline when a crawl source's content shifted between
      // snapshots. 0 = identical, 1000 = disjoint.
      graft.operators.Curation.histDrift(t(s, d, "documents"), "source",
          least(floor(size(TA.tokens(col("text"))) / 32).cast("long"),
            lit(63L)))
        // explicit null placement: Spark's asc is NULLS FIRST but
        // DuckDB's is NULLS LAST, and the null stratum is a real row
        .orderBy(col("s_a").asc_nulls_first, col("s_b").asc_nulls_first)
    }),

    "q_sample_weighted" -> ((s, d) => {
      // Weight-proportional deterministic sampling: inclusion odds
      // scale with token count (E[kept] = 100), so a budgeted corpus
      // cut keeps long documents preferentially without a sort or a
      // global rank — the importance-sampling complement of the
      // uniform q_sample_stratified.
      // NULL text = empty doc (1 whitespace token), not a NULL
      // weight — an unguarded null weight nulls the keep verdict
      val toks = TA.tokens(coalesce(col("text"), lit("")))
      graft.operators.DataSplit.weightedSample(
          t(s, d, "documents").select(col("doc_id"),
            size(toks).cast("long").as("n_tok")),
          "doc_id", col("n_tok"), expectK = 100)
        .select(col("doc_id"), col("w"), col("keep"))
        .orderBy("doc_id")
    }),

    "q_curation_pipeline" -> ((s, d) => {
      // The curation flow END-TO-END, composed from the same operators
      // the standalone queries use: permutation-dup clusters -> keep
      // the highest-quality member per cluster -> leakproof split of
      // the KEPT corpus (cluster roots, not ids) -> per-split volume.
      // Exercises the operator-owned-column composition contract the
      // standalone queries cannot (canonical output feeds split
      // input).
      val docs = t(s, d, "documents")
      val clusters = fingerprintClusters(docs)
      val kept = graft.operators.Curation
        .canonicalPerCluster(docs, "doc_id", clusters,
          TA.qualityScoreQ4(TA.tokens(col("text")), stopwords))
        .filter(col("keep"))
      graft.operators.Curation.leakproofSplit(kept, "doc_id", clusters)
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TA.tokens(col("text")))).cast("long").as("n_tok"),
          min("doc_id").as("min_id"))
        .orderBy("split")
    }),

    "q_corpus_stats" -> ((s, d) => {
      // Per-(source, lang) data card: volume, length, exact-dup rate,
      // mean heuristic quality. Every aggregate is an exact integer
      // sum (quality pre-rounded to 1e-4 units per doc); the derived
      // ratios are single IEEE divisions on exact operands, so the
      // card reproduces bit-identically on any engine/partitioning.
      val toks = TA.tokens(col("text"))
      val q4 = TA.qualityScoreQ4(toks, stopwords)
      val base = t(s, d, "documents").select(
        col("source"), col("lang"),
        size(toks).cast("long").as("ntok"),
        col("n_chars"),
        Dedup.exactDigest(col("text")).as("digest"),
        q4.as("q4"))
      base.groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("ntok").as("n_tok"),
          sum("n_chars").as("sum_chars"),
          countDistinct("digest").as("n_uniq"),
          sum("q4").as("q4_sum"))
        .select(col("source"), col("lang"), col("n_docs"), col("n_tok"),
          (col("n_tok").cast("double") / col("n_docs")).as("avg_tok"),
          col("sum_chars"), col("n_uniq"),
          ((col("n_docs") - col("n_uniq")).cast("double") / col("n_docs"))
            .as("dup_ratio"),
          (col("q4_sum").cast("double") / (col("n_docs") * lit(1e4)))
            .as("avg_q"))
        // NULL source/lang are real strata; pin their placement
        .orderBy(col("source").asc_nulls_first,
          col("lang").asc_nulls_first)
    }),

    "q_text_lm_score" -> ((s, d) => {
      // Corpus-trained unigram LM mean log-likelihood per doc — the
      // KenLM-style quality signal in relational form. Integer
      // micro-unit log-probs keep per-doc sums exact (partitioning-
      // independent); one ln() per vocabulary term, never per token.
      graft.operators.LanguageModel
        .unigramScore(t(s, d, "documents"), "doc_id",
          TA.tokens(col("text")))
        .select(col("doc").as("doc_id"), col("n_tok"), col("lp_micro"),
          col("avg_logp"))
        .orderBy("doc_id")
    }),

    "q_text_lm_crossscore" -> ((s, d) => {
      // Cross-corpus scoring: a bigram LM trained ONLY on src0+src1
      // (the "clean reference corpus") scores every document — the
      // CCNet deployment shape. OOV transitions surface as coverage,
      // not as an arbitrary likelihood penalty; low coverage = the
      // doc's transitions don't look like the reference.
      val docs = t(s, d, "documents")
      val lm = graft.operators.LanguageModel.bigramLm(
        docs.filter(col("source").isin("src0", "src1")),
        TA.tokens(col("text")))
      graft.operators.LanguageModel.scoreWithLm(
          docs, "doc_id", TA.bigrams(TA.tokens(col("text"))), lm, "bg")
        .select(col("doc").as("doc_id"), col("n_units").as("n_big"),
          col("n_modeled"), col("lp_micro"), col("coverage"),
          col("avg_logp"))
        .orderBy("doc_id")
    }),

    "q_text_lm_bigram" -> ((s, d) => {
      // Bigram conditional log-likelihood — the order-sensitive twin
      // of q_text_lm_score: common tokens in a nonsense order score
      // high there but low here. Docs with < 2 tokens have no
      // transitions and are absent (documented inner-join semantics).
      graft.operators.LanguageModel
        .bigramScore(t(s, d, "documents"), "doc_id",
          TA.tokens(col("text")))
        .select(col("doc").as("doc_id"), col("n_big"), col("lp_micro"),
          col("avg_logp"))
        .orderBy("doc_id")
    }),

    "q_dsir_weights" -> ((s, d) => {
      // DSIR importance reweighting: src0+src1 play the clean TARGET
      // distribution (the crossscore convention); every doc gets the
      // hashed-n-gram log ratio target-vs-raw in exact 1e-4 units and
      // a deterministic keep verdict (per-gram weight above the
      // corpus mean, compared by exact integer cross-multiplication).
      // m = 4096 hashed buckets (3 md5 hex digits).
      graft.operators.Dsir.importanceWeights(
          t(s, d, "documents"), "doc_id", TA.tokens(col("text")),
          isTarget = col("source").isin("src0", "src1"))
        .select(col("doc").as("doc_id"), col("n_grams"),
          col("logw_micro"), col("avg_logw"), col("keep"))
        .orderBy("doc_id")
    }),

    "q_decontaminate" -> ((s, d) => {
      // Benchmark decontamination: doc_id % 97 == 0 plays the role of
      // the held-out eval suite; every other doc is scored by the
      // fraction of its distinct trigrams that appear anywhere in the
      // eval set (broadcast eval shingles, one corpus pass).
      graft.operators.Decontaminate
        .contamination(t(s, d, "documents"), "doc_id", "text",
          isEval = col("doc_id") % 97 === 0, n = 3, threshold = 0.5)
        .orderBy("doc_id")
    }),

    "q_decontaminate_bloom" -> ((s, d) => {
      // Bloom twin of q_decontaminate: the eval trigram SET becomes a
      // ~16-bit-per-item bit array probed by a codegen map — the
      // corpus side has NO join and only the per-doc count shuffle
      // (ScaleSpec pins the plan). Round 16: ORACLE-CHECKED verdict
      // row (was the rows-only per-doc score listing, which lives on
      // as the bench-only tense q_decontaminate_bloom_scores): every
      // train doc's bloom verdict is compared against the EXACT
      // broadcast-join path (q_decontaminate's oracle-checked
      // operator) doc for doc under the one-sided-error contract —
      //  - both paths see the same docs and count the same distinct
      //    trigrams (n_row_mismatch / n_shingle_mismatch = 0);
      //  - a bloom cannot MISS: per-doc bloom hits >= exact hits
      //    (n_under_hits = 0) and no exact-contaminated doc escapes
      //    the bloom flag (n_flag_missed = 0) — nonzero means
      //    build/probe hash drift, the q_sim_ann_lsh foreign-space
      //    failure mode;
      //  - over-flagging is BOUNDED: at 16 bits/item the doc-level
      //    false-positive rate stays within 2 permille of the clean
      //    docs (measured 0 at sf0.001/sf0.01/derived sf1; the
      //    theoretical shingle FP at k=11 hashes is ~0.5 permille,
      //    and a doc flips only when FPs push its fraction past the
      //    0.5 threshold — far rarer still).
      val docs = t(s, d, "documents")
      val isEval = col("doc_id") % 97 === 0
      val model = graft.operators.Decontaminate
        .buildShingleBloom(docs, "doc_id", "text", isEval, n = 3)
      val bl = graft.operators.Decontaminate
        .bloomContamination(docs, "doc_id", "text", isEval, model,
          n = 3, threshold = 0.5)
        .select(col("doc_id"), col("n_shingles").as("ns_b"),
          col("n_bloom_hits"), col("contaminated").as("cont_b"))
      val ex = graft.operators.Decontaminate
        .contamination(docs, "doc_id", "text", isEval, n = 3,
          threshold = 0.5)
        .select(col("doc_id"), col("n_shingles").as("ns_e"),
          col("n_eval_hits"), col("contaminated").as("cont_e"))
      bl.join(ex, Seq("doc_id"), "full_outer")
        .agg(
          (count(lit(1)) > 0).cast("long").as("checked_nonzero"),
          coalesce(sum(when(col("ns_b").isNull || col("ns_e").isNull,
            1L).otherwise(0L)), lit(0L)).as("n_row_mismatch"),
          coalesce(sum(when(!(col("ns_b") <=> col("ns_e")),
            1L).otherwise(0L)), lit(0L)).as("n_shingle_mismatch"),
          coalesce(sum(when(col("n_bloom_hits") < col("n_eval_hits"),
            1L).otherwise(0L)), lit(0L)).as("n_under_hits"),
          coalesce(sum(when(col("cont_e") && !col("cont_b"),
            1L).otherwise(0L)), lit(0L)).as("n_flag_missed"),
          (floor(lit(1000) *
            coalesce(sum(when(col("cont_b") && !col("cont_e"), 1L)
              .otherwise(0L)), lit(0L)) /
            greatest(coalesce(sum(when(!col("cont_e"), 1L)
              .otherwise(0L)), lit(0L)), lit(1L))) <= 2)
            .as("fp_doc_within_bound"))
    }),

    "q_decontaminate_bloom_audit" -> ((s, d) => {
      // One corpus pass scoring every train trigram with BOTH the
      // exact broadcast-join verdict and the bloom probe. Round 16:
      // ORACLE-CHECKED verdict row (was rows-only) — the raw counts
      // (n_shingles, n_exact_hits, n_bloom_hits) reduce to the two
      // contract bits the constant oracle pins: n_false_neg MUST be 0
      // (blooms cannot miss; nonzero = build/probe hash drift) and
      // the shingle-level over-flag rate must hold the 16-bit/item
      // design bound (<= 2 permille; measured 0 at every shipped SF,
      // theoretical ~0.5 permille at k=11). The doc-level twin is
      // q_decontaminate_bloom; BloomSpec pins the kernel semantics on
      // planted contamination.
      val docs = t(s, d, "documents")
      val isEval = col("doc_id") % 97 === 0
      val model = graft.operators.Decontaminate
        .buildShingleBloom(docs, "doc_id", "text", isEval, n = 3)
      graft.operators.Decontaminate
        .bloomAudit(docs, "doc_id", "text", isEval, model, n = 3)
        .select(
          (col("n_shingles") > 0).cast("long").as("checked_nonzero"),
          col("n_false_neg").cast("long").as("n_false_neg"),
          (col("fp_permille") <= 2).as("fp_within_bound"))
    }),

    "q_bpe_train" -> ((s, d) => {
      // Greedy BPE tokenizer training (Sennrich) reduced to its
      // scale-correct relational core: ONE corpus pass builds the
      // word-frequency table, then every merge round is a VOCAB-sized
      // aggregate (pair explode -> sum -> 1-row argmax) applied with
      // the codegen graft_bpe_merge literal. 16 merges keeps the
      // round count bench-honest; the shape is round-count-linear.
      // Round 16: ORACLE-CHECKED agreement row (was the rows-only
      // merge listing) — the greedy iteration is still not
      // SQL-expressible, but it is deterministic (argmax tie-breaks
      // count desc, pair asc — a pure function of the corpus), so the
      // engine's TWO independent training regimes must agree
      // merge-for-merge: the DISTRIBUTED relational rounds
      // (trainDistributed — per-round pair explode + aggregate +
      // argmax) vs the DRIVER incremental loop (trainDriver —
      // Sennrich's pair-count tree + inverted index over the
      // collected vocab-sized table, the regime production
      // vocabularies run). They share only the BpeKernels merge-pass
      // kernel that DEFINES the symbol space (the r15 agreement-row
      // contract); rank, pair, and weighted frequency must all match.
      // checked_nonzero pins that all 16 merges actually happened.
      import s.implicits._
      val wf = graft.operators.Bpe.wordFreq(
          t(s, d, "documents"), TA.tokens(col("text")))
        .select(col("word").cast("string").as("word"),
          col("freq").cast("long").as("freq"))
        .filter(col("freq") > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // the two regimes read ONLY the persisted wf (materialized by
        // whichever future touches it first — cache locking serializes
        // the build) and share no mutable state: overlap the 16
        // distributed rounds with the driver loop (guide §2.6)
        val regimes = graft.operators.Concurrent.inParallel[Seq[
          graft.operators.Bpe.Merge]](Seq(
          () => graft.operators.Bpe.trainDistributed(wf, 16),
          () => graft.operators.Bpe.trainDriver(
            wf.as[(String, Long)].collect(), 16)))
        val (dist, drv) = (regimes(0), regimes(1))
        val nLenDiff = math.abs(dist.size - drv.size).toLong
        val nMergeDiff = dist.zip(drv).count { case (a, b) =>
          a != b }.toLong
        Seq((if (drv.size == 16) 1L else 0L, nLenDiff, nMergeDiff))
          .toDF("checked_nonzero", "n_len_diff", "n_merge_diff")
      } finally wf.unpersist()
    }),

    "q_bpe_tokencount" -> ((s, d) => {
      // APPLY half: re-tokenize the corpus under the learned merges.
      // The merge fold runs once per DISTINCT word (graft_bpe_encode
      // with the merge table as plan-time literals); the corpus side
      // is one tf groupBy + a broadcast probe of the (word, n_pieces)
      // table — per-occurrence cost is a hash lookup, never a fold.
      // Round 16: ORACLE-CHECKED agreement row (was the rows-only
      // per-doc count listing) — the operator's distinct-word encode
      // + broadcast-probe totals are compared doc for doc against an
      // INDEPENDENT recomputation that shares NOTHING with the
      // codegen path: each distinct word is re-encoded by a plain
      // driver-side Scala merge fold (codepoint split + per-merge
      // non-overlapping left-to-right pass, written here — not
      // BpeKernels), and per-doc totals are rebuilt through a fresh
      // tf groupBy. The driver collect is vocab-sized (the
      // DriverTrainMaxWords stance). Any per-word piece-count or
      // per-doc total divergence flips its counter.
      import s.implicits._
      val docs = t(s, d, "documents")
      // `words` feeds both the train call and the vocab collect —
      // persist it so the corpus-wide token explosion + groupBy runs
      // once, not once per consumer (the q_bpe_train wf pattern)
      val words = graft.operators.Bpe.wordFreq(docs, TA.tokens(col("text")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (merges, vocab) =
        try {
          (graft.operators.Bpe.train(words, numMerges = 16),
            words.select(col("word").cast("string")).as[String].collect())
        } finally words.unpersist()
      val op = graft.operators.Bpe.tokenCounts(
        docs, "doc_id", TA.tokens(col("text")), merges)
      val ms = merges.map(m => (m.left, m.right))
      val piecesDrv = vocab.toSeq
        .map(w => (w, bpeFoldReference(w, ms)))
        .toDF("word", "n_pieces_drv")
      val tf = docs.select(col("doc_id").as("doc"),
          explode(TA.tokens(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("doc", "word").agg(count(lit(1)).as("tf"))
      val re = tf.join(broadcast(piecesDrv), "word")
        .groupBy("doc")
        .agg(sum("tf").cast("long").as("n_words_re"),
          sum(col("tf") * col("n_pieces_drv")).cast("long")
            .as("n_bpe_re"))
      val agree = op.join(re, Seq("doc"), "full_outer")
        .agg(
          coalesce(sum(when(col("n_words_re").isNull, 1L)
            .otherwise(0L)), lit(0L)).as("n_extra"),
          coalesce(sum(when(col("n_words").isNull, 1L)
            .otherwise(0L)), lit(0L)).as("n_missing"),
          coalesce(sum(when(col("n_words").isNotNull &&
              col("n_words_re").isNotNull &&
              (!(col("n_words") <=> col("n_words_re")) ||
                !(col("n_bpe_tokens") <=> col("n_bpe_re"))), 1L)
            .otherwise(0L)), lit(0L)).as("n_val_diff"))
      docs.agg((count(lit(1)) > 0).cast("long").as("checked_nonzero"))
        .crossJoin(agree)
    }),

    "q_text_entropy" -> ((s, d) => {
      // Shannon token entropy per doc (nats) — the gibberish/
      // boilerplate quality axis orthogonal to LM score: H = ln(n) -
      // (1/n)·Σ c·ln(c). Exact across engines via the LM-score trick:
      // ln(c) is rounded ONCE per (doc, term) into integer 1e-4 units,
      // so the per-doc sum is exact integer arithmetic and the only
      // float ops (one division, one rnd) are order-independent.
      val tf = t(s, d, "documents")
        .select(col("doc_id"), explode(TA.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      tf.groupBy("doc_id")
        .agg(sum("tf").cast("long").as("n_tok"),
          count(lit(1)).cast("long").as("n_distinct"),
          sum(col("tf") *
            floor(log(col("tf").cast("double")) * 1e4 + 0.5).cast("long"))
            .cast("long").as("clnc_micro"))
        .withColumn("entropy", graft.rnd(
          (floor(log(col("n_tok").cast("double")) * 1e4 + 0.5) -
            col("clnc_micro").cast("double") / col("n_tok")) / 1e4, 4))
        .orderBy("doc_id")
    }),

    "q_pack_sequences" -> ((s, d) => {
      // Chunk -> pack into 64-token bins across 8 deterministic
      // shards (next-fit by running sum; see Packing). Summarized per
      // (shard, bin) so the oracle verifies every packing decision
      // without hashing full chunk text twice.
      val chunks = graft.operators.Chunking
        .chunkDocs(t(s, d, "documents")
            .withColumn("text", coalesce(col("text"), lit(""))),
          "doc_id", "text",
          chunkTokens = chunkTokensN, overlap = chunkOverlapN)
      graft.operators.Packing
        .packChunks(chunks, "doc_id", "chunk_idx", "n_chunk_tokens",
          maxTokens = 64, nShards = 8)
        .groupBy("shard", "bin")
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_chunk_tokens")).as("sum_tokens"))
        .orderBy("shard", "bin")
    }),

    "q_sample_stratified" -> ((s, d) => {
      // Deterministic per-stratum sampling rates (out of 256):
      // clicks 25%, views 12.5%, purchases 100%, signups 50%,
      // everything else dropped. Summarized per stratum so the check
      // verifies membership, not just cardinality.
      graft.operators.DataSplit.stratifiedSample(
          t(s, d, "events"), "event_id", "event_type",
          Map("click" -> 64, "view" -> 32, "purchase" -> 256,
            "signup" -> 128))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_sampled"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"))
        .orderBy("event_type")
    }),

    "q_text_heavy_hitters" -> ((s, d) => {
      // Tokens holding > 1/32 of the whole corpus — exact counts, but
      // the shuffle is bounded by the Misra-Gries prefilter, not by
      // vocabulary size.
      graft.operators.HeavyHitters.exactHeavyHitters(
          t(s, d, "documents")
            .select(explode(TA.tokens(col("text"))).as("token")),
          "token", k = 32)
        .orderBy("token")
    }),

    "q_mix_weighted" -> ((s, d) => {
      // Epochs per source: src0 ×2.25, src1 ×1, src2 ×0.5, src3 ×3,
      // everything else ×0.25. Row-level output (doc, copy) so the
      // oracle verifies membership and replica counts, not just sizes.
      graft.operators.Mixing.mixWeighted(
          t(s, d, "documents").select("doc_id", "source"),
          "doc_id", "source",
          Map("src0" -> 2.25, "src1" -> 1.0, "src2" -> 0.5,
            "src3" -> 3.0),
          defaultWeight = 0.25)
        .select(col("doc_id"), col("source"), col("copy"))
        .orderBy("doc_id", "copy")
    }),

    "q_text_tfidf" -> ((s, d) => {
      // Top-5 TF-IDF keywords per document — topic signal for
      // curation. All counts integer-exact; ln() rounded at 4dp.
      graft.operators.Keywords.tfidfTopK(
          t(s, d, "documents"), "doc_id", TA.tokens(col("text")), k = 5)
        .select(col("doc").as("doc_id"), col("rank"), col("term"),
          col("tf"), col("df"), col("score"))
        .orderBy("doc_id", "rank")
    }),

    "q_text_bm25" -> ((s, d) => {
      // BM25 ranked retrieval: every 50th doc's 3-token opening is a
      // seed query; top-10 corpus docs per query over the inverted
      // index. Scores in integer micro-units (exact, order-free sum).
      // The df skew cap stays at keep-all here: the synthetic corpus
      // has a ~30-word vocabulary where every term is stopword-grade
      // (df ≈ 780‰), so any useful permille cap empties the result —
      // the cap's drop semantics are pinned by RetrievalSpec instead.
      val docs = t(s, d, "documents")
      val qs = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"), col("text"))
      graft.operators.Retrieval.bm25TopK(
          docs, "doc_id", TA.tokens(col("text")),
          qs, "query_id", slice(TA.tokens(col("text")), 1, 3),
          k = 10, maxDfPermille = 1000)
        .select(col("query").as("query_id"), col("rank"),
          col("doc").as("doc_id"), col("score_q6"))
        .orderBy("query_id", "rank")
    }),

    "q_text_bm25_pruned" -> ((s, d) => {
      // The MaxScore-pruned dial over the SAME retrieval task —
      // result-identical to q_text_bm25 by construction (exact top-k
      // pruning, Retrieval.bm25TopKPrunedWith), so it shares that
      // query's DuckDB oracle verbatim: the driver hash-compares the
      // pruned path against the independent exhaustive SQL. On this
      // degenerate-vocabulary corpus every term is equally common, so
      // nothing demotes and the value here is the oracle-checked
      // degradation path; the Zipfian fixture where it actually
      // prunes is RetrievalSpec's.
      val docs = t(s, d, "documents")
      val qs = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"), col("text"))
      graft.operators.Retrieval.bm25TopKPrunedWith(
          graft.operators.Retrieval.postingsIndex(
            docs, "doc_id", TA.tokens(col("text"))),
          qs, "query_id", slice(TA.tokens(col("text")), 1, 3),
          k = 10, maxDfPermille = 1000)
        .select(col("query").as("query_id"), col("rank"),
          col("doc").as("doc_id"), col("score_q6"))
        .orderBy("query_id", "rank")
    }),

    "q_text_bm25_staged" -> ((s, d) => {
      // The PRODUCTION tense of the same retrieval task, oracle-checked
      // per round: corpus → bucketed postings TABLES
      // (createPostingsIndexTable), then the pruned probe through
      // loadPostingsIndex + loadPruneBounds — the serving path a
      // long-lived ingest deployment runs — hash-matched against the
      // SAME exhaustive DuckDB SQL as q_text_bm25. Table create is
      // overwrite-idempotent, so reruns in one session are safe.
      val docs = t(s, d, "documents")
      val prefix = "graft_bm25_serving"
      dropBm25Tables(s, prefix)
      graft.operators.Retrieval.createPostingsIndexTable(
        docs, "doc_id", TA.tokens(col("text")), prefix, buckets = 8)
      val qs = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"), col("text"))
      graft.operators.Retrieval.bm25TopKPrunedWith(
          graft.operators.Retrieval.loadPostingsIndex(s, prefix),
          qs, "query_id", slice(TA.tokens(col("text")), 1, 3),
          k = 10, maxDfPermille = 1000,
          bounds = Some(
            graft.operators.Retrieval.loadPruneBounds(s, prefix)))
        .select(col("query").as("query_id"), col("rank"),
          col("doc").as("doc_id"), col("score_q6"))
        .orderBy("query_id", "rank")
    }),

    "q_text_bm25_deleted" -> ((s, d) => {
      // The TAKEDOWN tense, oracle-checked per round: build the
      // bucketed postings tables over the FULL corpus, delete every
      // doc_id % 7 == 0 through the gated tombstone path
      // (deleteFromPostingsIndexTable — tombstones + negative
      // df/stats partials, postings untouched), then run the PRUNED
      // probe through loadPostingsIndex + loadPruneBounds. The bounds
      // are the full-corpus, stale-HIGH ones — exercising the claim
      // that a delete degrades pruning power but never exactness —
      // and the oracle recomputes df/N/avgdl over the SURVIVORS
      // independently, so any stale stat on the Spark side
      // hash-mismatches. Deleted docs still serve as queries (probe
      // input, not index state) but are never retrieved.
      val docs = t(s, d, "documents")
      val prefix = "graft_bm25_takedown"
      dropBm25Tables(s, prefix)
      graft.operators.Retrieval.createPostingsIndexTable(
        docs, "doc_id", TA.tokens(col("text")), prefix, buckets = 8)
      graft.operators.Retrieval.deleteFromPostingsIndexTable(
        s, docs.filter(col("doc_id") % 7 === 0).select("doc_id"),
        "doc_id", prefix, buckets = 8, batchId = Some(0L))
      val qs = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"), col("text"))
      graft.operators.Retrieval.bm25TopKPrunedWith(
          graft.operators.Retrieval.loadPostingsIndex(s, prefix),
          qs, "query_id", slice(TA.tokens(col("text")), 1, 3),
          k = 10, maxDfPermille = 1000,
          bounds = Some(
            graft.operators.Retrieval.loadPruneBounds(s, prefix)))
        .select(col("query").as("query_id"), col("rank"),
          col("doc").as("doc_id"), col("score_q6"))
        .orderBy("query_id", "rank")
    }),

    "q_text_bm25_filtered" -> ((s, d) => {
      // Filtered retrieval: the metadata constraint production search
      // always carries (here lang = 'en'), applied INSIDE the ranking
      // via restrictToDocs — rank k is the k-th ALLOWED doc, which a
      // post-truncation filter cannot produce. Scoring stats stay
      // corpus-level (an allowed doc scores identically under any
      // filter — the standard engine stance), which the oracle
      // mirrors by ranking the full-corpus score table joined to the
      // allowlist.
      val docs = t(s, d, "documents")
      val ix = graft.operators.Retrieval.postingsIndex(
        docs, "doc_id", TA.tokens(col("text")))
      val allowed = docs.filter(col("lang") === "en").select("doc_id")
      val qs = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"), col("text"))
      graft.operators.Retrieval.bm25TopKWith(
          graft.operators.Retrieval.restrictToDocs(ix, allowed,
            "doc_id"),
          qs, "query_id", slice(TA.tokens(col("text")), 1, 3),
          k = 10, maxDfPermille = 1000)
        .select(col("query").as("query_id"), col("rank"),
          col("doc").as("doc_id"), col("score_q6"))
        .orderBy("query_id", "rank")
    }),

    "q_retrieval_takedown_audit" -> ((s, d) => {
      // Proof of erasure, oracle-checked: build the postings tables,
      // gated-delete doc_id % 7 == 0, then audit a MIXED request set
      // (the victims plus the % 50 == 0 docs). The oracle computes
      // each surface independently in DuckDB: a victim reads
      // (serving 0, physical terms+1, tombstoned) — silenced
      // instantly, erased at the next compaction — while a live doc
      // reads (1, terms+1, not tombstoned). The %350 == 0 ids sit in
      // BOTH classes and must read as victims.
      val docs = t(s, d, "documents")
      val prefix = "graft_bm25_audit"
      dropBm25Tables(s, prefix)
      graft.operators.Retrieval.createPostingsIndexTable(
        docs, "doc_id", TA.tokens(col("text")), prefix, buckets = 8)
      graft.operators.Retrieval.deleteFromPostingsIndexTable(
        s, docs.filter(col("doc_id") % 7 === 0).select("doc_id"),
        "doc_id", prefix, buckets = 8, batchId = Some(0L))
      val req = docs
        .filter(col("doc_id") % 7 === 0 || col("doc_id") % 50 === 0)
        .select("doc_id")
      graft.operators.Retrieval.takedownAudit(s, req, "doc_id", prefix)
        .select(col("doc").as("doc_id"), col("serving_rows"),
          col("physical_rows"), col("tombstoned"))
        .orderBy("doc_id")
    }),

    "q_retrieval_rerank" -> ((s, d) => {
      // The retrieve-then-rerank funnel: BM25 top-50 candidates per
      // seed query (stage 1, lexical recall — the q_text_bm25 task at
      // a wider k), self excluded AFTER the top-k cut (the documented
      // wiring contract: ≤ 49 candidates, matching the oracle's
      // rank <= 50 AND doc <> query), then exact cosine between the
      // query doc's embedding and each candidate's embedding decides
      // the final top-10 (stage 2, dense precision). The dense math
      // runs over candidates only — never corpus×corpus.
      val docs = t(s, d, "documents")
      val qs = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"), col("text"))
      val cands = graft.operators.Retrieval.bm25TopK(
          docs, "doc_id", TA.tokens(col("text")),
          qs, "query_id", slice(TA.tokens(col("text")), 1, 3),
          k = 50, maxDfPermille = 1000)
        .filter(col("doc") =!= col("query"))
      val emb = t(s, d, "embeddings")
      graft.operators.Retrieval.rerankByCosine(
          cands, emb, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 10)
        .select(col("query").as("query_id"), col("rank"),
          col("doc").as("doc_id"), rnd(col("cos"), 4).as("cos"))
        .orderBy("query_id", "rank")
    }),

    "q_retrieval_hybrid_rrf" -> ((s, d) => {
      // Hybrid retrieval: the BM25 top-10 lexical list fused with the
      // dense brute-cosine top-10 list by reciprocal-rank fusion
      // (integer micro-units, rank-only — no score calibration). The
      // dense probe emits (q_id, rank, c_id); the two-column rename
      // below is the documented adapter onto rrfFuse's (query, rank,
      // doc) contract.
      val docs = t(s, d, "documents")
      val qs = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"), col("text"))
      val bm = graft.operators.Retrieval.bm25TopK(
        docs, "doc_id", TA.tokens(col("text")),
        qs, "query_id", slice(TA.tokens(col("text")), 1, 3),
        k = 10, maxDfPermille = 1000)
      val emb = t(s, d, "embeddings")
      val dense = graft.operators.Similarity.bruteForceTopK(
          emb.filter(col("vec_id") % 50 === 0), emb,
          "vec_id", "embedding", k = 10)
        .select(col("q_id").as("query"),
          col("rank").cast("long").as("rank"), col("c_id").as("doc"))
      graft.operators.Retrieval.rrfFuse(Seq(bm, dense), k = 10)
        .select(col("query").as("query_id"), col("rank"),
          col("doc").as("doc_id"), col("rrf_q6"))
        .orderBy("query_id", "rank")
    }),

    "q_global_shuffle" -> ((s, d) => {
      // Reproducible global shuffle: every doc gets a (shard, pos)
      // address that is a pure function of (doc_id, seed).
      graft.operators.Shuffling.shuffleShard(
          t(s, d, "documents").select("doc_id"),
          "doc_id", nShards = 8, seed = "epoch0")
        .orderBy("shard", "pos")
    }),

    "q_source_cap" -> ((s, d) => {
      // Domain balancing: at most 10 docs per source, kept as a
      // deterministic salted-hash sample.
      graft.operators.Budget.capPerGroup(
          t(s, d, "documents").select("doc_id", "source"),
          "doc_id", "source", cap = 10)
        .orderBy("doc_id")
    }),

    "q_token_budget" -> ((s, d) => {
      // Fixed token budget: keep docs in quality order until 20k
      // whitespace tokens are spent — the ablation-cut shape.
      val toks = TA.tokens(col("text"))
      val scored = t(s, d, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("n_tok"),
        TA.qualityScore(col("text"), toks, stopwords).as("score"))
      graft.operators.Budget.takeWeightBudget(
          scored, "n_tok", budget = 20000L,
          bucket = -floor(col("score") * 8).cast("long"),
          order = Seq(col("score").desc, col("doc_id").asc))
        .select(col("doc_id"), col("n_tok"), col("score"), col("running"))
        .orderBy("doc_id")
    }),

    "q_multimodal_meta" -> ((s, d) => {
      t(s, d, "documents").select(
        col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long")
          .as("n_bytes"),
        ascii(substring(col("text"), 1, 1)).cast("long").as("first_byte"))
        .orderBy("doc_id")
    }),

    "q_dedup_phash" -> ((s, d) => {
      // Near-dup detection for the BINARY modality column: perceptual
      // hash per payload (map-only codegen kernel), then the same
      // 4x16-bit banded hamming join the text simhash path uses —
      // payload bytes never enter the shuffle. Round 15:
      // ORACLE-CHECKED verdict row (was rows-only) — the
      // q_dedup_simhash_banded band-exactness agreement row on the
      // phash fingerprints (the operators share
      // hammingNearDupsBanded, so the same independent recomputation
      // applies verbatim); MultimodalSpec pins the byte-perturbation
      // semantics. maxHamming = 3 keeps the query
      // inside the band-EXACT regime (pigeonhole over 4x16-bit bands
      // — the result is complete, not candidate-generated), which
      // matters here because a 64-byte payload yields a coarse aHash
      // and looser thresholds over-match. The fixture payload is the
      // 64-char text PREFIX, not the full text: this corpus's
      // near-dups permute later tokens (which scrambles byte stripes
      // — phash, like the image hashes it stands in for, is
      // alignment-sensitive) but share opening boilerplate, so the
      // prefix payload carries real byte-level dups and the sf0.01
      // driver check returns a meaningful pair count instead of the
      // near-vacuous 1 row the full-text payload produced.
      val blobs = graft.operators.Multimodal.withPayload(
        t(s, d, "documents").withColumn("blob_src",
          substring(col("text"), 1, 64)),
        "doc_id", "blob_src", "text")
      bandedAgreementVerdict(
        graft.operators.Multimodal.payloadNearDups(
          blobs, "doc_id", "payload", maxHamming = 3),
        blobs.select(col("doc_id").as("doc"),
          graft.operators.Multimodal.perceptualHash(col("payload"))
            .as("fp")),
        bucketCap = 10000)
    }),

    "q_dedup_phash_precision" -> ((s, d) => {
      // Precision twin for q_dedup_phash: the emitted binary-modality
      // pairs re-verified against perceptual hashes recomputed
      // directly from the payload bytes on a fresh scan (no banding,
      // no distinct-fingerprint factorization) — reported hamming
      // must equal the recomputed bit_count(xor) and clear
      // maxHamming = 3.
      val blobs = graft.operators.Multimodal.withPayload(
        t(s, d, "documents").withColumn("blob_src",
          substring(col("text"), 1, 64)),
        "doc_id", "blob_src", "text")
      val fp = blobs.select(col("doc_id"),
        graft.operators.Multimodal.perceptualHash(col("payload"))
          .as("fp"))
      val pairs = graft.operators.Multimodal.payloadNearDups(
        blobs, "doc_id", "payload", maxHamming = 3)
      val checked = pairs
        .join(fp.select(col("doc_id").as("doc_a"), col("fp").as("fp_a")),
          "doc_a")
        .join(fp.select(col("doc_id").as("doc_b"), col("fp").as("fp_b")),
          "doc_b")
        .withColumn("exact_ham",
          bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
      precisionVerdict(checked,
        col("exact_ham") =!= col("hamming") || col("exact_ham") > 3 ||
          col("doc_a") >= col("doc_b"))
    })
  )

  /** Shared CTE stack for the two quality-fit oracles: the
    * q_text_lm_bigram pipeline down to per-doc (n_big, lp_q4), the
    * integer Q4 features, the joined train set, the exact moments
    * (HUGEINT — products of Q4 sums stay far under the 1.7e38 HUGEINT
    * ceiling at the sf0.01 oracle scale; the Spark side solves in
    * BigInt and has no ceiling), and the 3×3 Cramer determinants.
    * Weight quantization is round-half-away-from-zero via truncating
    * division — `//` here, BigInt `/` in ModelFit.quantize — so both
    * engines produce bit-identical Q4 weights. */
  private def qualityFitSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS t
      |  FROM documents),
      |bgl AS (
      |  SELECT doc_id, unnest(list_transform(
      |    generate_series(1, greatest(len(t) - 1, 0)),
      |    i -> t[i] || ' ' || t[i + 1])) AS bg
      |  FROM toks),
      |tf AS (SELECT doc_id, bg, count(*) AS tf FROM bgl GROUP BY 1, 2),
      |c2 AS (SELECT bg, CAST(sum(tf) AS BIGINT) AS c2 FROM tf GROUP BY 1),
      |ctx AS (
      |  SELECT string_split(bg, ' ')[1] AS prev,
      |    CAST(sum(c2) AS BIGINT) AS c1
      |  FROM c2 GROUP BY 1),
      |lp AS (
      |  SELECT bg,
      |    CAST(floor(ln(CAST(c2 AS DOUBLE) / c1) * 10000.0 + 0.5) AS BIGINT)
      |      AS lp
      |  FROM c2 JOIN ctx ON string_split(bg, ' ')[1] = ctx.prev),
      |ylm AS (
      |  SELECT tf.doc_id,
      |    CAST(sum(tf.tf) AS BIGINT) AS n_big,
      |    CAST(sum(tf.tf * lp.lp) AS BIGINT) AS lp_q4
      |  FROM tf JOIN lp USING (bg) GROUP BY 1),
      |train AS (
      |  SELECT f.doc_id, f.f_stop, f.f_len,
      |    ylm.lp_q4 // (ylm.n_big * 100) AS y
      |  FROM (SELECT doc_id,
      |          (len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and', 'to')))
      |             * 20000 + len(t)) // (2 * len(t)) AS f_stop,
      |          least(len(t), 100) * 100 AS f_len
      |        FROM toks) f
      |  JOIN ylm ON f.doc_id = ylm.doc_id),
      |m AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(f_stop) AS HUGEINT) AS sf1,
      |    CAST(sum(f_len) AS HUGEINT) AS sf2,
      |    CAST(sum(f_stop * f_stop) AS HUGEINT) AS s11,
      |    CAST(sum(f_stop * f_len) AS HUGEINT) AS s12,
      |    CAST(sum(f_len * f_len) AS HUGEINT) AS s22,
      |    CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(f_stop * y) AS HUGEINT) AS s1y,
      |    CAST(sum(f_len * y) AS HUGEINT) AS s2y
      |  FROM train),
      |cr AS (
      |  SELECT m.*,
      |    n * (s11 * s22 - s12 * s12)
      |      - sf1 * (sf1 * s22 - s12 * sf2)
      |      + sf2 * (sf1 * s12 - s11 * sf2) AS det,
      |    sy * (s11 * s22 - s12 * s12)
      |      - sf1 * (s1y * s22 - s12 * s2y)
      |      + sf2 * (s1y * s12 - s11 * s2y) AS num0,
      |    n * (s1y * s22 - s12 * s2y)
      |      - sy * (sf1 * s22 - s12 * sf2)
      |      + sf2 * (sf1 * s2y - s1y * sf2) AS num1,
      |    n * (s11 * s2y - s1y * s12)
      |      - sf1 * (sf1 * s2y - s1y * sf2)
      |      + sy * (sf1 * s12 - s11 * sf2) AS num2
      |  FROM m),
      |w AS (
      |  SELECT cr.*,
      |    (2 * num0 * 10000 + CASE WHEN num0 < 0 THEN -det ELSE det END)
      |      // (2 * det) AS w0,
      |    (2 * num1 * 10000 + CASE WHEN num1 < 0 THEN -det ELSE det END)
      |      // (2 * det) AS w1,
      |    (2 * num2 * 10000 + CASE WHEN num2 < 0 THEN -det ELSE det END)
      |      // (2 * det) AS w2
      |  FROM cr)""".stripMargin

  /** The shared BM25 CTE chain (through the per-(query, doc) exact
    * micro-unit score table `s`) — the prefix of the bm25 oracle and
    * of the stage-2 rerank/fusion oracles built on its candidates. */
  /** The BM25 CTE chain, parameterized over the corpus the INDEX is
    * built from (`corpusWhere` filters the docs). The query set q
    * always comes from the FULL documents table — queries are probe
    * inputs, not index state, so a deleted doc can still ask but can
    * never be retrieved (the q_text_bm25_deleted semantics). */
  private def bm25CoreCtesOver(corpusWhere: String): String =
    s"""WITH corpus AS (
      |  SELECT doc_id, text FROM documents$corpusWhere),
      |t AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |  FROM corpus),
      |tf AS (SELECT doc_id AS doc, term, count(*) AS tf
      |       FROM t GROUP BY 1, 2),
      |len AS (SELECT doc, CAST(sum(tf) AS BIGINT) AS len
      |        FROM tf GROUP BY 1),
      |stats AS (
      |  SELECT (SELECT count(*) FROM corpus) AS n_docs,
      |         (SELECT CAST(sum(len) AS DOUBLE) FROM len) AS tot_len),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |kept AS (SELECT term, df FROM df, stats
      |         WHERE df * 1000 <= 1000 * n_docs),
      |q AS (
      |  SELECT DISTINCT doc_id AS query,
      |    unnest((string_split(lower(text), ' '))[1:3]) AS term
      |  FROM documents WHERE doc_id % 50 = 0),
      |probe AS (
      |  SELECT q.query, tf.doc, tf.tf, kept.df, len.len,
      |         stats.n_docs, stats.tot_len
      |  FROM q JOIN tf USING (term) JOIN kept USING (term)
      |    JOIN len ON tf.doc = len.doc, stats),
      |contrib AS (
      |  SELECT query, doc,
      |    CAST(floor(
      |      ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
      |      * (tf * (1.2 + 1.0) / (tf + 1.2 * ((1.0 - 0.75)
      |          + 0.75 * len / (tot_len / CAST(n_docs AS DOUBLE)))))
      |      * 1000000.0 + 0.5) AS BIGINT) AS contrib_q6
      |  FROM probe),
      |s AS (SELECT query, doc, CAST(sum(contrib_q6) AS BIGINT)
      |        AS score_q6 FROM contrib GROUP BY 1, 2)""".stripMargin

  private val bm25CoreCtes: String = bm25CoreCtesOver("")

  private val bm25TopTail: String =
    """
      |SELECT query AS query_id, CAST(rank AS BIGINT) AS rank,
      |  doc AS doc_id, score_q6
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query
      |    ORDER BY score_q6 DESC, doc ASC) AS rank
      |  FROM s) r
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** The exhaustive BM25 oracle — shared verbatim by q_text_bm25 and
    * q_text_bm25_pruned: the pruned probe is exact top-k pruning, so
    * both implementations must hash-match this one independent SQL. */
  private val bm25OracleSql: String = bm25CoreCtes + bm25TopTail

  /** The takedown oracle: the SAME exhaustive BM25 SQL computed over
    * the SURVIVING corpus — df, N and avgdl all recomputed over the
    * survivors by DuckDB independently, so a stale stat anywhere on
    * the Spark side (a df not decremented, an n_docs still counting a
    * victim) hash-mismatches. Queries still come from the FULL table:
    * a deleted doc may ask, never answer. */
  private val bm25DeletedOracleSql: String =
    bm25CoreCtesOver(" WHERE doc_id % 7 <> 0") + bm25TopTail

  /** Filtered retrieval oracle: the SAME full-corpus score table,
    * ranked over the allowlist join — corpus-level stats, filter
    * inside the ranking (the restrictToDocs contract, verbatim). */
  private val bm25FilteredOracleSql: String = bm25CoreCtes +
    """,
      |allowed AS (SELECT doc_id AS doc FROM documents
      |            WHERE lang = 'en')
      |SELECT query AS query_id, CAST(rank AS BIGINT) AS rank,
      |  doc AS doc_id, score_q6
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query
      |    ORDER BY score_q6 DESC, doc ASC) AS rank
      |  FROM s JOIN allowed USING (doc)) r
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** The erasure-audit oracle: each surface computed independently —
    * a victim is silenced (serving 0) but not yet erased (physical =
    * distinct terms + the doclen registry row) and tombstoned; a live
    * doc serves 1 row, holds the same physical shape, no tombstone.
    * LEFT join + coalesce because a NULL-text doc has no term rows
    * yet still holds its registry row (nt = 0, physical = 1) — the
    * nullcheck gate injects exactly that shape. */
  private val takedownAuditOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |  FROM documents),
      |nterms AS (
      |  SELECT doc_id, count(DISTINCT term) AS nt FROM t GROUP BY 1),
      |req AS (
      |  SELECT doc_id, (doc_id % 7 = 0) AS victim FROM documents
      |  WHERE doc_id % 7 = 0 OR doc_id % 50 = 0)
      |SELECT r.doc_id,
      |  CAST(CASE WHEN r.victim THEN 0 ELSE 1 END AS BIGINT)
      |    AS serving_rows,
      |  CAST(COALESCE(n.nt, 0) + 1 AS BIGINT) AS physical_rows,
      |  r.victim AS tombstoned
      |FROM req r LEFT JOIN nterms n USING (doc_id)
      |ORDER BY r.doc_id""".stripMargin

  /** Retrieve-then-rerank oracle: BM25 top-50 candidates (self
    * excluded), exact cosine between the query doc's embedding and
    * each candidate's embedding (the q_sim_cosine_topk generate_series
    * kernel — both engines widen float32→float64 identically), top-10
    * by (cos desc, doc asc), cosine rounded at 4dp. */
  private val rerankOracleSql: String = bm25CoreCtes +
    """,
      |cand AS (
      |  SELECT query, doc FROM (
      |    SELECT query, doc, row_number() OVER (PARTITION BY query
      |      ORDER BY score_q6 DESC, doc ASC) AS rank
      |    FROM s) r
      |  WHERE rank <= 50 AND doc <> query),
      |dims AS (SELECT unnest(generate_series(1, 64)) AS i),
      |na AS (SELECT vec_id, sqrt(sum(CAST(embedding[i] AS DOUBLE)
      |         * CAST(embedding[i] AS DOUBLE))) AS nrm
      |       FROM embeddings, dims
      |       WHERE embedding IS NOT NULL GROUP BY vec_id),
      |dotp AS (
      |  SELECT c.query, c.doc,
      |    sum(CAST(qe.embedding[i] AS DOUBLE)
      |      * CAST(de.embedding[i] AS DOUBLE)) AS dot
      |  FROM cand c
      |    JOIN embeddings qe ON qe.vec_id = c.query
      |    JOIN embeddings de ON de.vec_id = c.doc, dims
      |  WHERE qe.embedding IS NOT NULL AND de.embedding IS NOT NULL
      |  GROUP BY 1, 2),
      |rr AS (
      |  SELECT d.query, d.doc,
      |    CASE WHEN x.nrm * y.nrm = 0 THEN 0
      |         ELSE d.dot / (x.nrm * y.nrm) END AS cos
      |  FROM dotp d JOIN na x ON x.vec_id = d.query
      |              JOIN na y ON y.vec_id = d.doc)
      |SELECT query AS query_id, CAST(rank AS BIGINT) AS rank,
      |  doc AS doc_id, floor(cos * 10000.0 + 0.5) / 10000.0 AS cos
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query
      |    ORDER BY cos DESC, doc ASC) AS rank
      |  FROM rr) r
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Hybrid RRF oracle: the BM25 top-10 list fused with the dense
    * brute-cosine top-10 list (self-pairs excluded on the dense side,
    * the bruteForceTopK contract) by reciprocal-rank fusion in integer
    * micro-units — floor(10⁶/(60+rank)) summed per (query, doc). */
  private val hybridRrfOracleSql: String = bm25CoreCtes +
    """,
      |bm AS (
      |  SELECT query, doc, rank FROM (
      |    SELECT query, doc, row_number() OVER (PARTITION BY query
      |      ORDER BY score_q6 DESC, doc ASC) AS rank
      |    FROM s) r
      |  WHERE rank <= 10),
      |dims AS (SELECT unnest(generate_series(1, 64)) AS i),
      |na AS (SELECT vec_id, sqrt(sum(CAST(embedding[i] AS DOUBLE)
      |         * CAST(embedding[i] AS DOUBLE))) AS nrm
      |       FROM embeddings, dims
      |       WHERE embedding IS NOT NULL GROUP BY vec_id),
      |pairs AS (
      |  SELECT a.vec_id AS query, b.vec_id AS doc,
      |    sum(CAST(a.embedding[i] AS DOUBLE)
      |      * CAST(b.embedding[i] AS DOUBLE)) AS dot
      |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id,
      |    dims
      |  WHERE a.vec_id % 50 = 0
      |    AND a.embedding IS NOT NULL AND b.embedding IS NOT NULL
      |  GROUP BY 1, 2),
      |dn AS (
      |  SELECT p.query, p.doc,
      |    CASE WHEN x.nrm * y.nrm = 0 THEN 0
      |         ELSE p.dot / (x.nrm * y.nrm) END AS cos
      |  FROM pairs p JOIN na x ON x.vec_id = p.query
      |               JOIN na y ON y.vec_id = p.doc),
      |dtop AS (
      |  SELECT query, doc, rank FROM (
      |    SELECT query, doc, row_number() OVER (PARTITION BY query
      |      ORDER BY cos DESC, doc ASC) AS rank
      |    FROM dn) r
      |  WHERE rank <= 10),
      |unioned AS (
      |  SELECT query, doc, rank FROM bm
      |  UNION ALL SELECT query, doc, rank FROM dtop),
      |fused AS (
      |  SELECT query, doc,
      |    CAST(sum(CAST(floor(1000000.0 / (60 + rank)) AS BIGINT))
      |      AS BIGINT) AS rrf_q6
      |  FROM unioned GROUP BY 1, 2)
      |SELECT query AS query_id, CAST(rank AS BIGINT) AS rank,
      |  doc AS doc_id, rrf_q6
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query
      |    ORDER BY rrf_q6 DESC, doc ASC) AS rank
      |  FROM fused) r
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_text_quality_fit" ->
      s"""$qualityFitSql
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(sf1 AS BIGINT) AS s_f_stop,
        |  CAST(sf2 AS BIGINT) AS s_f_len,
        |  CAST(s11 AS BIGINT) AS s_f_stop_f_stop,
        |  CAST(s12 AS BIGINT) AS s_f_stop_f_len,
        |  CAST(s22 AS BIGINT) AS s_f_len_f_len,
        |  CAST(sy AS BIGINT) AS s_y,
        |  CAST(s1y AS BIGINT) AS s_f_stop_y,
        |  CAST(s2y AS BIGINT) AS s_f_len_y,
        |  CAST(w0 AS BIGINT) AS w_bias_q4,
        |  CAST(w1 AS BIGINT) AS w_f_stop_q4,
        |  CAST(w2 AS BIGINT) AS w_f_len_q4
        |FROM w""".stripMargin,

    "q_text_quality_distill" ->
      s"""$qualityFitSql
        |SELECT t.doc_id, t.f_stop, t.f_len, t.y,
        |  CAST(w.w1 * t.f_stop + w.w2 * t.f_len + w.w0 AS BIGINT) AS pred,
        |  CAST(w.w1 * t.f_stop + w.w2 * t.f_len + w.w0
        |    - t.y * 10000 AS BIGINT) AS resid
        |FROM train t CROSS JOIN w ORDER BY doc_id""".stripMargin,

    "q_text_tokenize" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents) t
        |GROUP BY token ORDER BY token""".stripMargin,

    "q_text_ngrams" ->
      """WITH toks AS (
        |  SELECT string_split(lower(text), ' ') AS t FROM documents),
        |bg AS (
        |  SELECT t[i] || ' ' || t[i + 1] AS bigram
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s)
        |SELECT bigram, count(*) AS cnt FROM bg
        |GROUP BY bigram ORDER BY bigram""".stripMargin,

    "q_text_stats" ->
      """SELECT doc_id,
        |  length(text) AS chars,
        |  len(string_split(lower(text), ' ')) AS n_tok,
        |  len(list_distinct(string_split(lower(text), ' '))) AS n_distinct,
        |  floor((CAST(length(text) - (len(string_split(lower(text), ' ')) - 1) AS DOUBLE)
        |    / CAST(len(string_split(lower(text), ' ')) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS avg_tok_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_langid" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS ratio
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN ratio < 0.20 THEN 'zh'
        |       WHEN ratio < 0.24 THEN 'de'
        |       WHEN ratio < 0.28 THEN 'en'
        |       ELSE 'es' END AS pred_lang,
        |  lang,
        |  coalesce((CASE WHEN ratio < 0.20 THEN 'zh'
        |        WHEN ratio < 0.24 THEN 'de'
        |        WHEN ratio < 0.28 THEN 'en'
        |        ELSE 'es' END) = lang, false) AS correct
        |FROM r ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      """WITH q AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)
        |SELECT doc_id,
        |  len(t) AS words,
        |  floor((CAST(len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        |    / CAST(greatest(len(t), 1) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS stop_ratio,
        |  floor((CAST(len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        |    / CAST(greatest(len(t), 1) AS DOUBLE) * 0.5
        |    + CAST(least(len(t), 100) AS DOUBLE) / 100.0 * 0.5) * 10000.0 + 0.5) / 10000.0 AS score
        |FROM q ORDER BY doc_id""".stripMargin,

    "q_text_tokencount" ->
      """SELECT doc_id,
        |  len(string_split(lower(text), ' ')) AS n_ws,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_fingerprint" ->
      // coalesce matches Spark's concat_ws null-array semantics:
      // null text fingerprints as md5(''), never NULL (see
      // TextAnalysis.contentFingerprint scaladoc)
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    string_split(lower(coalesce(text, '')), ' '))), ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_docs,
        |  md5(lower(trim(text))) AS digest
        |FROM documents GROUP BY md5(lower(trim(text)))
        |ORDER BY keep_id""".stripMargin,

    "q_dedup_spans" ->
      // mirrors Dedup.stripRepeatedSpans: content-defined spans (a
      // token ENDS its span when it matches [.!?]$ or its last md5
      // hex digit ≡ 0 mod dedupSpanTokens), overlong spans sub-tiled
      // at dedupSpanSubCap tokens from the span start, census on the
      // LOWERED span, drop spans with df*1000 > n_docs*10
      // (integer-exact 1%), reassemble survivors in position order
      // from the ORIGINAL-case tokens. The modulus and cap literals
      // are INTERPOLATED from the same constants the Spark call
      // uses — they cannot silently desync.
      // instr('0123456789abcdef', ·)-1 is DuckDB's spelling of
      // Spark's conv(hex_digit, 16, 10).
      s"""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS otoks
        |  FROM documents),
        |tiles AS (
        |  SELECT doc_id, otoks,
        |    unnest(generate_series(1, len(otoks))) AS j
        |  FROM t),
        |tok AS (
        |  SELECT doc_id, j - 1 AS tpos, otoks[j] AS otok,
        |    lower(otoks[j]) AS ltok
        |  FROM tiles),
        |brk AS (
        |  SELECT *, CASE WHEN regexp_matches(ltok, '[.!?]${"$"}')
        |      OR (instr('0123456789abcdef', substr(md5(ltok), 32, 1)) - 1)
        |         % $dedupSpanTokens = 0
        |    THEN 1 ELSE 0 END AS b
        |  FROM tok),
        |sp0 AS (
        |  SELECT *, sum(b) OVER (PARTITION BY doc_id ORDER BY tpos) - b
        |    AS span_id
        |  FROM brk),
        |sp1 AS (
        |  SELECT *, (tpos - min(tpos) OVER (PARTITION BY doc_id, span_id))
        |    // $dedupSpanSubCap AS sub
        |  FROM sp0),
        |spans AS (
        |  SELECT doc_id, span_id, sub, min(tpos) AS pos,
        |    string_agg(ltok, ' ' ORDER BY tpos) AS span,
        |    string_agg(otok, ' ' ORDER BY tpos) AS span_orig
        |  FROM sp1 GROUP BY doc_id, span_id, sub),
        |hot AS (
        |  SELECT span FROM spans GROUP BY span
        |  HAVING count(DISTINCT doc_id) * 1000 >
        |    10 * (SELECT count(*) FROM documents)),
        |kept AS (
        |  SELECT * FROM spans WHERE span NOT IN (SELECT span FROM hot)),
        |rb AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    string_agg(span_orig, ' ' ORDER BY pos) AS clean_text
        |  FROM kept GROUP BY doc_id),
        |n AS (
        |  SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(rb.clean_text, '') AS clean_text,
        |  CAST(coalesce(rb.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(coalesce(n.n_spans, 0) - coalesce(rb.n_kept, 0) AS BIGINT)
        |    AS n_dropped
        |FROM documents d
        |LEFT JOIN n USING (doc_id)
        |LEFT JOIN rb USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_dedup_substring" ->
      // Mirrors Dedup.sharedPassages via the shared constants (DuckDB
      // slice t[i:i+k-1] is the inclusive k-token window; pos is
      // rebased to 0), the permille distinct-doc df cap in exact
      // integers, diagonal gaps-and-islands for maximal runs. The
      // island CTE chain is shared with q_dedup_substring_strip.
      s"""$substringIslandsSql
        |SELECT doc_a, doc_b, CAST(a_start AS BIGINT) AS a_start,
        |  CAST(a_start - diag AS BIGINT) AS b_start,
        |  CAST(len_tokens AS BIGINT) AS len_tokens
        |FROM isl WHERE len_tokens >= $substringMinTokens
        |ORDER BY doc_a, doc_b, a_start, b_start""".stripMargin,

    "q_dedup_substring_strip" ->
      // Same islands; every interval is cut from the HIGHER-id doc
      // (union of positions per victim), tokens reassembled in
      // original casing.
      s"""$substringIslandsSql,
        |cut AS (
        |  SELECT DISTINCT doc_b AS doc_id, b_start + j AS tpos FROM (
        |    SELECT doc_b, a_start - diag AS b_start, len_tokens
        |    FROM isl WHERE len_tokens >= $substringMinTokens) i,
        |  LATERAL (SELECT unnest(generate_series(0, i.len_tokens - 1)) AS j) g),
        |otok AS (
        |  SELECT doc_id, i - 1 AS tpos, t[i] AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) x,
        |  LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) s),
        |kept AS (
        |  SELECT o.* FROM otok o
        |  WHERE NOT EXISTS (SELECT 1 FROM cut c
        |    WHERE c.doc_id = o.doc_id AND c.tpos = o.tpos)),
        |reb AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean_text,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY doc_id),
        |szs AS (SELECT doc_id AS sdoc, count(*) AS n_tok
        |        FROM otok GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(reb.clean_text, '') AS clean_text,
        |  CAST(coalesce(szs.n_tok, 0) - coalesce(reb.n_kept, 0) AS BIGINT)
        |    AS n_tokens_dropped
        |FROM documents d
        |LEFT JOIN reb ON reb.doc_id = d.doc_id
        |LEFT JOIN szs ON szs.sdoc = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Precision (no-false-positive) twins for the sketch families:
    // the exact pair set cannot be enumerated in SQL (that is the
    // point of the sketches), but the Spark side recomputes every
    // EMITTED pair's exact metric on an independent path and folds to
    // a verdict row this constant oracle pins — non-vacuously, since
    // an operator emitting nothing fails checked_nonzero.
    "q_minhash_precision" -> precisionOracleSql,
    "q_dedup_simhash_precision" -> precisionOracleSql,
    "q_dedup_simhash_banded_precision" -> precisionOracleSql,
    "q_dedup_phash_precision" -> precisionOracleSql,

    // band-exactness agreement rows (round 15 — were rows-only): the
    // factored banded join must equal the independent doc-granularity
    // recomputation pair for pair, hamming for hamming — on the text
    // simhash fingerprints and on the binary modality's phash
    "q_dedup_simhash_banded" -> agreementOracleSql,
    "q_dedup_phash" -> agreementOracleSql,

    // windowed / minhash agreement rows (round 15 — were rows-only):
    // the operator's pair set vs an independent recomputation sharing
    // only the fingerprint/signature kernel
    "q_dedup_simhash" -> agreementOracleSql,
    "q_minhash_neardup" -> agreementOracleSql,

    // round 16 verdict conversions (were rows-only):
    // census agreement — the skew census vs an independent fresh-scan
    // full band histogram, bucket for bucket
    "q_dedup_simhash_audit" ->
      ("SELECT CAST(1 AS BIGINT) AS checked_nonzero, " +
        "CAST(0 AS BIGINT) AS n_extra, " +
        "CAST(0 AS BIGINT) AS n_missing, " +
        "CAST(0 AS BIGINT) AS n_size_diff"),
    // bloom one-sided-error contract, doc level (vs the exact
    // broadcast-join path) and shingle level (the raw-count audit)
    "q_decontaminate_bloom" ->
      ("SELECT CAST(1 AS BIGINT) AS checked_nonzero, " +
        "CAST(0 AS BIGINT) AS n_row_mismatch, " +
        "CAST(0 AS BIGINT) AS n_shingle_mismatch, " +
        "CAST(0 AS BIGINT) AS n_under_hits, " +
        "CAST(0 AS BIGINT) AS n_flag_missed, " +
        "TRUE AS fp_doc_within_bound"),
    "q_decontaminate_bloom_audit" ->
      ("SELECT CAST(1 AS BIGINT) AS checked_nonzero, " +
        "CAST(0 AS BIGINT) AS n_false_neg, " +
        "TRUE AS fp_within_bound"),
    // BPE regime agreement (distributed relational rounds vs the
    // driver incremental loop) and apply-path agreement (codegen
    // distinct-word encode vs a plain driver merge fold)
    "q_bpe_train" ->
      ("SELECT CAST(1 AS BIGINT) AS checked_nonzero, " +
        "CAST(0 AS BIGINT) AS n_len_diff, " +
        "CAST(0 AS BIGINT) AS n_merge_diff"),
    "q_bpe_tokencount" ->
      ("SELECT CAST(1 AS BIGINT) AS checked_nonzero, " +
        "CAST(0 AS BIGINT) AS n_extra, " +
        "CAST(0 AS BIGINT) AS n_missing, " +
        "CAST(0 AS BIGINT) AS n_val_diff"),

    "q_dedup_ngram_jaccard" ->
      s"""WITH $jaccardSqlCtes
         |SELECT doc_a, doc_b,
         |  $jaccardSqlExpr AS jaccard
         |FROM inter
         |JOIN sizes na ON na.doc = doc_a
         |JOIN sizes nb ON nb.doc = doc_b
         |WHERE $jaccardSqlExpr >= $jaccardThreshold
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $jaccardSqlCtes,
         |prs AS (
         |  SELECT doc_a, doc_b FROM inter
         |  JOIN sizes na ON na.doc = doc_a
         |  JOIN sizes nb ON nb.doc = doc_b
         |  WHERE $jaccardSqlExpr >= $jaccardThreshold),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM prs
         |          UNION SELECT doc_b, doc_a FROM prs),
         |reach(s, t) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.s, e.v FROM reach r JOIN edges e ON e.u = r.t)
         |SELECT s AS doc, least(s, min(t)) AS root
         |FROM reach GROUP BY s ORDER BY doc""".stripMargin,

    "q_text_redact" ->
      """SELECT event_id,
        |  regexp_replace(
        |    regexp_replace(props, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |    '[0-9]+', '<NUM>', 'g') AS props_redacted
        |FROM events ORDER BY event_id""".stripMargin,

    "q_split_train_test" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 12 THEN 'train'
        |      WHEN strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 14 THEN 'val'
        |      ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS n_docs, min(doc_id) AS min_id
        |FROM s GROUP BY split ORDER BY split""".stripMargin,

    "q_text_nfc" ->
      """WITH x AS (
        |  SELECT doc_id,
        |    coalesce(text, '') || ' cafe' || chr(769) || ' ' || chr(8491) AS raw
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(raw) AS norm_text,
        |  (length(nfc_normalize(raw)) != length(raw)) AS changed
        |FROM x ORDER BY doc_id""".stripMargin,

    "q_text_pipeline" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    string_split(lower(text), ' ') AS t,
        |    CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS ratio,
        |    regexp_replace(
        |      regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |      '[0-9]+', '<NUM>', 'g') AS clean
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, clean FROM s
        |  WHERE (CASE WHEN ratio < 0.20 THEN 'zh'
        |              WHEN ratio < 0.24 THEN 'de'
        |              WHEN ratio < 0.28 THEN 'en'
        |              ELSE 'es' END) = 'en'
        |    AND floor((CAST(len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        |      / CAST(greatest(len(t), 1) AS DOUBLE) * 0.5
        |      + CAST(least(len(t), 100) AS DOUBLE) / 100.0 * 0.5) * 10000.0 + 0.5) / 10000.0 >= 0.5)
        |SELECT min(doc_id) AS keep_id, count(*) AS n_docs,
        |  md5(lower(trim(clean))) AS digest
        |FROM f GROUP BY md5(lower(trim(clean)))
        |ORDER BY keep_id""".stripMargin,

    "q_text_chunk" ->
      s"""WITH $chunkSqlCtes
         |SELECT doc_id, chunk_idx, chunk,
         |  CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_chunk_tokens
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_text_quality_model" ->
      // mirrors TA.linearModelQ8 application: Q4 features (midpoint-
      // rounded 1e-4 units), Q4 literal weights, exact BIGINT Q8
      // score, integer threshold for keep
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(coalesce(text, '')), ' ') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, t,
        |    list_transform(generate_series(1, greatest(len(t) - 1, 0)),
        |      i -> t[i] || ' ' || t[i + 1]) AS g2
        |  FROM toks),
        |f AS (
        |  SELECT doc_id,
        |    CAST(floor(CAST(len(list_filter(t,
        |        x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        |      / CAST(greatest(len(t), 1) AS DOUBLE) * 10000.0 + 0.5)
        |      AS BIGINT) AS stop_q4,
        |    CAST(CASE WHEN len(g2) = 0 THEN 0
        |      ELSE floor((1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
        |        / CAST(len(g2) AS DOUBLE)) * 10000.0 + 0.5) END
        |      AS BIGINT) AS rep_q4,
        |    CAST(floor(CAST(least(len(t), 100) AS DOUBLE) / 100.0
        |      * 10000.0 + 0.5) AS BIGINT) AS lensat_q4,
        |    CAST(CASE WHEN len(t) < 20 THEN 10000 ELSE 0 END AS BIGINT)
        |      AS short_q4
        |  FROM g),
        |s AS (
        |  SELECT doc_id,
        |    8000 * stop_q4 - 12000 * rep_q4 + 6000 * lensat_q4
        |      - 5000 * short_q4 + 20000000 AS score_q8
        |  FROM f)
        |SELECT doc_id,
        |  CAST(score_q8 AS DOUBLE) / 100000000.0 AS score,
        |  score_q8 >= 45000000 AS keep
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(coalesce(text, '')), ' ') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, greatest(len(t) - 1, 0)),
        |      i -> t[i] || ' ' || t[i + 1]) AS g2,
        |    list_transform(generate_series(1, greatest(len(t) - 2, 0)),
        |      i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) AS g3
        |  FROM toks)
        |SELECT doc_id,
        |  CASE WHEN len(g2) = 0 THEN 0.0
        |    ELSE floor((1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
        |      / CAST(len(g2) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 END
        |    AS dup_2gram,
        |  CASE WHEN len(g3) = 0 THEN 0.0
        |    ELSE floor((1.0 - CAST(len(list_distinct(g3)) AS DOUBLE)
        |      / CAST(len(g3) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 END
        |    AS dup_3gram
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_mix_temperature" ->
      // mirrors Mixing.temperatureE256: per-stratum sqrt term rounded
      // to integer micro-units BEFORE the sum, one exact integer
      // division to e256; then the ":mixT"-salted nibble bucket
      // replication exactly as the q_mix_weighted oracle
      """WITH n AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_tot FROM n),
        |t AS (
        |  SELECT lang, n_s,
        |    CAST(floor(sqrt(CAST(n_s AS DOUBLE) / n_tot) * 1000000.0 + 0.5)
        |      AS BIGINT) AS term
        |  FROM n, tot),
        |s AS (SELECT CAST(sum(term) AS BIGINT) AS s_micro FROM t),
        |w AS (
        |  SELECT lang,
        |    least((term * 256 * n_tot) // (s_micro * n_s), 4096) AS e256
        |  FROM t, s, tot),
        |d AS (
        |  SELECT doc_id, docs.lang, e256 // 256 AS copies, e256 % 256 AS frac,
        |    (strpos('0123456789abcdef',
        |       substring(md5(CAST(doc_id AS VARCHAR) || ':mixT'), 1, 1)) - 1) * 16 +
        |    strpos('0123456789abcdef',
        |       substring(md5(CAST(doc_id AS VARCHAR) || ':mixT'), 2, 1)) - 1 AS bucket
        |  FROM documents docs
        |  JOIN w ON docs.lang IS NOT DISTINCT FROM w.lang),
        |e AS (
        |  SELECT d.*, c.i AS copy
        |  FROM d CROSS JOIN (SELECT unnest(generate_series(0, 16)) AS i) c
        |  WHERE c.i <= copies)
        |SELECT doc_id, lang, CAST(copy AS BIGINT) AS copy
        |FROM e WHERE copy < copies OR bucket < frac
        |ORDER BY doc_id, copy""".stripMargin,

    "q_dedup_matrix" ->
      """WITH g AS (
        |  SELECT md5(array_to_string(list_sort(list_distinct(
        |      string_split(lower(coalesce(text, '')), ' '))), ' ')) AS digest,
        |    source, count(*) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |p AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    CASE WHEN a.source IS NOT DISTINCT FROM b.source
        |         THEN a.cnt * (a.cnt - 1) // 2
        |         ELSE a.cnt * b.cnt END AS pairs
        |  FROM g a JOIN g b ON a.digest = b.digest
        |    AND (a.source IS NULL OR a.source <= b.source))
        |SELECT src_a, src_b,
        |  CAST(sum(pairs) AS BIGINT) AS dup_pairs,
        |  CAST(sum(CASE WHEN pairs > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_digests
        |FROM p GROUP BY 1, 2
        |HAVING CAST(sum(pairs) AS BIGINT) > 0
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,

    "q_dedup_canonical" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_sort(list_distinct(
        |      string_split(lower(coalesce(text, '')), ' '))), ' ')) AS fp,
        |    string_split(lower(text), ' ') AS t
        |  FROM documents),
        |r AS (SELECT fp, min(doc_id) AS root FROM f GROUP BY fp),
        |q AS (
        |  SELECT f.doc_id, r.root,
        |    CAST(floor((CAST(len(list_filter(f.t,
        |        x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        |      / CAST(greatest(len(f.t), 1) AS DOUBLE) * 0.5
        |      + CAST(least(len(f.t), 100) AS DOUBLE) / 100.0 * 0.5)
        |      * 10000.0 + 0.5) AS BIGINT) AS prio
        |  FROM f JOIN r ON f.fp = r.fp)
        |SELECT doc_id, root, prio,
        |  (row_number() OVER (PARTITION BY root
        |     ORDER BY prio DESC, doc_id) = 1) AS keep
        |FROM q ORDER BY doc_id""".stripMargin,

    "q_split_leakproof" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_sort(list_distinct(
        |      string_split(lower(coalesce(text, '')), ' '))), ' ')) AS fp
        |  FROM documents),
        |r AS (SELECT fp, min(doc_id) AS root FROM f GROUP BY fp),
        |j AS (SELECT f.doc_id, r.root FROM f JOIN r ON f.fp = r.fp)
        |SELECT doc_id, root,
        |  CASE
        |    WHEN strpos('0123456789abcdef',
        |      substring(md5(CAST(root AS VARCHAR)), 1, 1)) - 1 < 12
        |      THEN 'train'
        |    WHEN strpos('0123456789abcdef',
        |      substring(md5(CAST(root AS VARCHAR)), 1, 1)) - 1 < 14
        |      THEN 'val'
        |    ELSE 'test' END AS split
        |FROM j ORDER BY doc_id""".stripMargin,

    "q_sample_weighted" -> {
      // first 8 md5 hex digits as a nibble polynomial (DuckDB has no
      // base-16 conv) — coefficients are powers of two, sum < 2^32 so
      // BIGINT is exact; the keep verdict cross-multiplies in HUGEINT
      // exactly like the Spark DECIMAL(38,0) form
      val h32 = (1 to 8).map { i =>
        val coef = 1L << (4 * (8 - i))
        s"(strpos('0123456789abcdef', substring(hex, $i, 1)) - 1) * $coef"
      }.mkString(" +\n     ")
      s"""WITH b AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(lower(coalesce(text, '')), ' ')) AS BIGINT) AS w,
         |    md5(CAST(doc_id AS VARCHAR)) AS hex
         |  FROM documents),
         |t AS (SELECT sum(w) AS tot_w FROM b),
         |v AS (SELECT doc_id, w, ($h32) AS h FROM b)
         |SELECT v.doc_id, v.w,
         |  (v.w > 0 AND CAST(v.h AS HUGEINT) * t.tot_w
         |     < CAST(100 AS HUGEINT) * v.w * 4294967296) AS keep
         |FROM v, t ORDER BY v.doc_id""".stripMargin
    },

    "q_curation_pipeline" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_sort(list_distinct(
        |      string_split(lower(coalesce(text, '')), ' '))), ' ')) AS fp,
        |    string_split(lower(text), ' ') AS t
        |  FROM documents),
        |r AS (SELECT fp, min(doc_id) AS root FROM f GROUP BY fp),
        |q AS (
        |  SELECT f.doc_id, r.root, len(f.t) AS n_tok,
        |    CAST(floor((CAST(len(list_filter(f.t,
        |        x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        |      / CAST(greatest(len(f.t), 1) AS DOUBLE) * 0.5
        |      + CAST(least(len(f.t), 100) AS DOUBLE) / 100.0 * 0.5)
        |      * 10000.0 + 0.5) AS BIGINT) AS prio
        |  FROM f JOIN r ON f.fp = r.fp),
        |kept AS (
        |  SELECT doc_id, root, n_tok FROM (
        |    SELECT q.*, row_number() OVER (PARTITION BY root
        |      ORDER BY prio DESC, doc_id) AS rn FROM q)
        |  WHERE rn = 1),
        |s AS (
        |  SELECT doc_id, n_tok,
        |    CASE
        |      WHEN strpos('0123456789abcdef',
        |        substring(md5(CAST(root AS VARCHAR)), 1, 1)) - 1 < 12
        |        THEN 'train'
        |      WHEN strpos('0123456789abcdef',
        |        substring(md5(CAST(root AS VARCHAR)), 1, 1)) - 1 < 14
        |        THEN 'val'
        |      ELSE 'test' END AS split
        |  FROM kept)
        |SELECT split, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tok, min(doc_id) AS min_id
        |FROM s GROUP BY split ORDER BY split""".stripMargin,

    "q_corpus_drift" ->
      """WITH h AS (
        |  SELECT source AS s,
        |    least(len(string_split(lower(text), ' ')) // 32, 63) AS b,
        |    count(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |tt AS (SELECT s, sum(n) AS tot FROM h GROUP BY s),
        |p AS (SELECT a.s AS s_a, a.tot AS t_a, b.s AS s_b, b.tot AS t_b
        |      FROM tt a JOIN tt b
        |        ON a.s < b.s OR (a.s IS NULL AND b.s IS NOT NULL)),
        |bk AS (SELECT DISTINCT b FROM h),
        |g AS (SELECT p.*, bk.b FROM p CROSS JOIN bk),
        |x AS (SELECT g.s_a, g.s_b, g.t_a, g.t_b,
        |        COALESCE(ha.n, 0) AS n_a, COALESCE(hb.n, 0) AS n_b
        |      FROM g LEFT JOIN h ha
        |               ON ha.s IS NOT DISTINCT FROM g.s_a
        |              AND ha.b IS NOT DISTINCT FROM g.b
        |             LEFT JOIN h hb
        |               ON hb.s IS NOT DISTINCT FROM g.s_b
        |              AND hb.b IS NOT DISTINCT FROM g.b)
        |SELECT s_a, s_b,
        |  CAST((500 * sum(abs(CAST(n_a AS HUGEINT) * t_b
        |      - CAST(n_b AS HUGEINT) * t_a)))
        |    // (CAST(t_a AS HUGEINT) * t_b) AS BIGINT) AS tv_permille
        |FROM x GROUP BY s_a, s_b, t_a, t_b
        |ORDER BY s_a NULLS FIRST, s_b NULLS FIRST""".stripMargin,

    "q_corpus_stats" ->
      """WITH q AS (
        |  SELECT source, lang, n_chars,
        |    string_split(lower(text), ' ') AS t,
        |    md5(lower(trim(text))) AS digest
        |  FROM documents),
        |b AS (
        |  SELECT source, lang, n_chars, len(t) AS ntok, digest,
        |    CAST(floor((CAST(len(list_filter(t,
        |        x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        |      / CAST(greatest(len(t), 1) AS DOUBLE) * 0.5
        |      + CAST(least(len(t), 100) AS DOUBLE) / 100.0 * 0.5)
        |      * 10000.0 + 0.5) AS BIGINT) AS q4
        |  FROM q)
        |SELECT source, lang,
        |  count(*) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS n_tok,
        |  CAST(sum(ntok) AS BIGINT) / CAST(count(*) AS DOUBLE) AS avg_tok,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  count(DISTINCT digest) AS n_uniq,
        |  (count(*) - count(DISTINCT digest)) / CAST(count(*) AS DOUBLE)
        |    AS dup_ratio,
        |  CAST(sum(q4) AS BIGINT) / (count(*) * 10000.0) AS avg_q
        |FROM b GROUP BY 1, 2
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,

    "q_text_lm_score" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |v AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM v),
        |lp AS (
        |  SELECT term,
        |    CAST(floor(ln(CAST(c AS DOUBLE) / t) * 10000.0 + 0.5) AS BIGINT)
        |      AS lp
        |  FROM v, tot)
        |SELECT tf.doc_id,
        |  CAST(sum(tf.tf) AS BIGINT) AS n_tok,
        |  CAST(sum(tf.tf * lp.lp) AS BIGINT) AS lp_micro,
        |  CAST(sum(tf.tf * lp.lp) AS BIGINT)
        |    / (CAST(sum(tf.tf) AS BIGINT) * 10000.0) AS avg_logp
        |FROM tf JOIN lp USING (term)
        |GROUP BY tf.doc_id ORDER BY doc_id""".stripMargin,

    "q_text_entropy" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |agg AS (
        |  SELECT doc_id,
        |    CAST(sum(tf) AS BIGINT) AS n_tok,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(sum(tf * CAST(floor(ln(CAST(tf AS DOUBLE)) * 10000.0
        |      + 0.5) AS BIGINT)) AS BIGINT) AS clnc_micro
        |  FROM tf GROUP BY doc_id)
        |SELECT doc_id, n_tok, n_distinct, clnc_micro,
        |  floor(((CAST(floor(ln(CAST(n_tok AS DOUBLE)) * 10000.0 + 0.5)
        |      AS DOUBLE) - CAST(clnc_micro AS DOUBLE) / n_tok)
        |    / 10000.0) * 10000.0 + 0.5) / 10000.0 AS entropy
        |FROM agg ORDER BY doc_id""".stripMargin,

    "q_text_lm_crossscore" ->
      """WITH toks AS (
        |  SELECT doc_id, source, string_split(lower(text), ' ') AS t
        |  FROM documents),
        |bgl AS (
        |  SELECT doc_id, source, unnest(list_transform(
        |    generate_series(1, greatest(len(t) - 1, 0)),
        |    i -> t[i] || ' ' || t[i + 1])) AS bg
        |  FROM toks),
        |c2 AS (SELECT bg, count(*) AS c2 FROM bgl
        |       WHERE source IN ('src0', 'src1') GROUP BY 1),
        |ctx AS (
        |  SELECT string_split(bg, ' ')[1] AS prev,
        |    CAST(sum(c2) AS BIGINT) AS c1
        |  FROM c2 GROUP BY 1),
        |lp AS (
        |  SELECT bg,
        |    CAST(floor(ln(CAST(c2 AS DOUBLE) / c1) * 10000.0 + 0.5) AS BIGINT)
        |      AS lp
        |  FROM c2 JOIN ctx ON string_split(bg, ' ')[1] = ctx.prev),
        |tf AS (SELECT doc_id, bg, count(*) AS tf FROM bgl GROUP BY 1, 2)
        |SELECT tf.doc_id,
        |  CAST(sum(tf.tf) AS BIGINT) AS n_big,
        |  CAST(sum(CASE WHEN lp.lp IS NOT NULL THEN tf.tf ELSE 0 END)
        |    AS BIGINT) AS n_modeled,
        |  CAST(sum(tf.tf * coalesce(lp.lp, 0)) AS BIGINT) AS lp_micro,
        |  CAST(sum(CASE WHEN lp.lp IS NOT NULL THEN tf.tf ELSE 0 END)
        |    AS BIGINT) / CAST(sum(tf.tf) AS DOUBLE) AS coverage,
        |  CAST(sum(tf.tf * coalesce(lp.lp, 0)) AS BIGINT)
        |    / (greatest(CAST(sum(CASE WHEN lp.lp IS NOT NULL THEN tf.tf
        |        ELSE 0 END) AS BIGINT), 1) * 10000.0) AS avg_logp
        |FROM tf LEFT JOIN lp USING (bg)
        |GROUP BY tf.doc_id ORDER BY doc_id""".stripMargin,

    "q_text_lm_bigram" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t
        |  FROM documents),
        |bgl AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, greatest(len(t) - 1, 0)),
        |    i -> t[i] || ' ' || t[i + 1])) AS bg
        |  FROM toks),
        |tf AS (SELECT doc_id, bg, count(*) AS tf FROM bgl GROUP BY 1, 2),
        |c2 AS (SELECT bg, CAST(sum(tf) AS BIGINT) AS c2 FROM tf GROUP BY 1),
        |ctx AS (
        |  SELECT string_split(bg, ' ')[1] AS prev,
        |    CAST(sum(c2) AS BIGINT) AS c1
        |  FROM c2 GROUP BY 1),
        |lp AS (
        |  SELECT bg,
        |    CAST(floor(ln(CAST(c2 AS DOUBLE) / c1) * 10000.0 + 0.5) AS BIGINT)
        |      AS lp
        |  FROM c2 JOIN ctx ON string_split(bg, ' ')[1] = ctx.prev)
        |SELECT tf.doc_id,
        |  CAST(sum(tf.tf) AS BIGINT) AS n_big,
        |  CAST(sum(tf.tf * lp.lp) AS BIGINT) AS lp_micro,
        |  CAST(sum(tf.tf * lp.lp) AS BIGINT)
        |    / (CAST(sum(tf.tf) AS BIGINT) * 10000.0) AS avg_logp
        |FROM tf JOIN lp USING (bg)
        |GROUP BY tf.doc_id ORDER BY doc_id""".stripMargin,

    "q_dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, source, string_split(lower(text), ' ') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, source, unnest(t || list_transform(
        |    generate_series(1, greatest(len(t) - 1, 0)),
        |    i -> t[i] || ' ' || t[i + 1])) AS g
        |  FROM toks),
        |feats AS (
        |  SELECT doc_id, source,
        |    (strpos('0123456789abcdef', substring(md5(g), 1, 1)) - 1) * 256 +
        |    (strpos('0123456789abcdef', substring(md5(g), 2, 1)) - 1) * 16 +
        |    strpos('0123456789abcdef', substring(md5(g), 3, 1)) - 1 AS bucket,
        |    count(*) AS cnt
        |  FROM grams GROUP BY 1, 2, 3),
        |qm AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS cq
        |       FROM feats GROUP BY 1),
        |pm AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS cp
        |       FROM feats WHERE source IN ('src0', 'src1') GROUP BY 1),
        |tot AS (SELECT
        |  (SELECT CAST(sum(cq) AS BIGINT) FROM qm) AS tq,
        |  (SELECT CAST(coalesce(sum(cp), 0) AS BIGINT) FROM pm) AS tp),
        |lam AS (
        |  SELECT qm.bucket,
        |    CAST(floor(ln(CAST(coalesce(cp, 0) + 1 AS DOUBLE)
        |        / CAST(tp + 4096 AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT)
        |  - CAST(floor(ln(CAST(cq + 1 AS DOUBLE)
        |        / CAST(tq + 4096 AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT)
        |      AS lam
        |  FROM qm LEFT JOIN pm USING (bucket) CROSS JOIN tot),
        |per_doc AS (
        |  SELECT f.doc_id,
        |    CAST(sum(f.cnt) AS BIGINT) AS n_grams,
        |    CAST(sum(f.cnt * lam.lam) AS BIGINT) AS logw_micro
        |  FROM feats f JOIN lam ON f.bucket = lam.bucket
        |  GROUP BY f.doc_id),
        |ct AS (SELECT CAST(sum(logw_micro) AS BIGINT) AS tot_logw,
        |              CAST(sum(n_grams) AS BIGINT) AS tot_n
        |       FROM per_doc)
        |SELECT doc_id, n_grams, logw_micro,
        |  logw_micro / (n_grams * 10000.0) AS avg_logw,
        |  logw_micro * tot_n > tot_logw * n_grams AS keep
        |FROM per_doc CROSS JOIN ct ORDER BY doc_id""".stripMargin,

    "q_decontaminate" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |    SELECT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS g
        |    FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
        |          FROM documents) d,
        |         LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) s)),
        |ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id, sh.g, ev.g AS hit FROM sh
        |       LEFT JOIN ev ON sh.g = ev.g WHERE doc_id % 97 <> 0)
        |SELECT doc_id,
        |  count(*) AS n_shingles,
        |  count(hit) AS n_eval_hits,
        |  floor((CAST(count(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS contamination,
        |  floor((CAST(count(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 >= 0.5 AS contaminated
        |FROM tr GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_pack_sequences" ->
      // THE chunking CTEs of q_text_chunk (shared definition), then
      // next-fit packing as a windowed running sum per shard
      // (doc_id % 8). sum(BIGINT) widens to HUGEINT in DuckDB ->
      // CAST back (SURVEY 7.4).
      s"""WITH $chunkSqlCtes,
        |ch AS (
        |  SELECT doc_id, chunk_idx,
        |    CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tok,
        |    CAST(doc_id % 8 AS BIGINT) AS shard
        |  FROM c),
        |p AS (
        |  SELECT shard, n_tok,
        |    sum(n_tok) OVER (PARTITION BY shard
        |      ORDER BY doc_id ASC, chunk_idx ASC
        |      ROWS UNBOUNDED PRECEDING) - n_tok AS bin_offset
        |  FROM ch),
        |b AS (
        |  SELECT shard,
        |    CAST(floor(CAST(bin_offset AS DOUBLE) / 64.0) AS BIGINT) AS bin,
        |    n_tok
        |  FROM p)
        |SELECT shard, bin, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens
        |FROM b GROUP BY shard, bin ORDER BY shard, bin""".stripMargin,

    "q_sample_stratified" ->
      """WITH b AS (
        |  SELECT event_id, event_type,
        |    (strpos('0123456789abcdef',
        |       substring(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1) * 16 +
        |    strpos('0123456789abcdef',
        |       substring(md5(CAST(event_id AS VARCHAR)), 2, 1)) - 1 AS bucket
        |  FROM events),
        |s AS (
        |  SELECT * FROM b
        |  WHERE bucket < CASE event_type
        |    WHEN 'click' THEN 64 WHEN 'view' THEN 32
        |    WHEN 'purchase' THEN 256 WHEN 'signup' THEN 128
        |    ELSE 0 END)
        |SELECT event_type, count(*) AS n_sampled,
        |  min(event_id) AS min_id, max(event_id) AS max_id
        |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_text_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents),
        |c AS (SELECT token, count(*) AS cnt FROM t GROUP BY token)
        |SELECT token, cnt FROM c
        |WHERE cnt * 32 > (SELECT count(*) FROM t)
        |ORDER BY token""".stripMargin,

    "q_mix_weighted" ->
      """WITH w(source, copies, frac) AS (
        |  VALUES ('src0', 2, 64), ('src1', 1, 0), ('src2', 0, 128),
        |         ('src3', 3, 0)),
        |d AS (
        |  SELECT doc_id, docs.source,
        |    coalesce(w.copies, 0) AS copies, coalesce(w.frac, 64) AS frac,
        |    (strpos('0123456789abcdef',
        |       substring(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 1)) - 1) * 16 +
        |    strpos('0123456789abcdef',
        |       substring(md5(CAST(doc_id AS VARCHAR) || ':mix'), 2, 1)) - 1 AS bucket
        |  FROM documents docs LEFT JOIN w ON docs.source = w.source),
        |e AS (
        |  SELECT d.*, c.i AS copy
        |  FROM d CROSS JOIN (VALUES (0), (1), (2), (3)) c(i)
        |  WHERE c.i <= copies)
        |SELECT doc_id, source, CAST(copy AS BIGINT) AS copy
        |FROM e WHERE copy < copies OR bucket < frac
        |ORDER BY doc_id, copy""".stripMargin,

    "q_text_tfidf" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    floor(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df)
        |      * 10000.0 + 0.5) / 10000.0 AS score
        |  FROM tf JOIN df USING (term), n)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, score
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term ASC) AS rank
        |  FROM s) r
        |WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,

    "q_text_bm25" -> bm25OracleSql,

    // result-identical by construction (exact top-k pruning), so the
    // pruned path hash-checks against the SAME independent SQL
    "q_text_bm25_pruned" -> bm25OracleSql,

    // the staged-TABLES serving path is result-identical too (one
    // probe definition for all tenses), so it shares the same SQL
    "q_text_bm25_staged" -> bm25OracleSql,
    // takedown: the same SQL over the surviving corpus only
    "q_text_bm25_deleted" -> bm25DeletedOracleSql,
    "q_retrieval_takedown_audit" -> takedownAuditOracleSql,
    "q_text_bm25_filtered" -> bm25FilteredOracleSql,

    "q_retrieval_rerank" -> rerankOracleSql,

    "q_retrieval_hybrid_rrf" -> hybridRrfOracleSql,

    "q_global_shuffle" -> {
      // the 60-bit md5 prefix as a nibble polynomial (DuckDB has no
      // base-16 conv); coefficients are exact powers of two, the sum
      // stays under 2^60 so BIGINT arithmetic is exact — mirrors
      // Shuffling.shuffleShard's conv(substring(hex, 1, 15), 16, 10)
      val prefix = (1 to 15).map { i =>
        val coef = 1L << (4 * (15 - i))
        s"(strpos('0123456789abcdef', substring(hex, $i, 1)) - 1) * $coef"
      }.mkString(" +\n     ")
      s"""WITH h AS (
         |  SELECT doc_id,
         |    md5(CAST(doc_id AS VARCHAR) || ':epoch0') AS hex
         |  FROM documents),
         |v AS (
         |  SELECT doc_id, hex,
         |    ($prefix) % 8 AS shard
         |  FROM h)
         |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hex, doc_id)
         |    AS BIGINT) AS pos
         |FROM v ORDER BY shard, pos""".stripMargin
    },

    "q_source_cap" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':cap'), doc_id) AS rn
        |  FROM documents) r
        |WHERE rn <= 10 ORDER BY doc_id""".stripMargin,

    "q_token_budget" ->
      """WITH q AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,
        |    floor((CAST(len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        |      / CAST(greatest(len(t), 1) AS DOUBLE) * 0.5
        |      + CAST(least(len(t), 100) AS DOUBLE) / 100.0 * 0.5) * 10000.0 + 0.5) / 10000.0 AS score
        |  FROM q),
        |r AS (
        |  SELECT doc_id, n_tok, score,
        |    CAST(sum(n_tok) OVER (ORDER BY score DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS running
        |  FROM s)
        |SELECT doc_id, n_tok, score, running FROM r
        |WHERE running <= 20000 ORDER BY doc_id""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte
        |FROM documents ORDER BY doc_id""".stripMargin
  )

  /** Bench-only tenses: run by [[graft.Bench]] for throughput
    * continuity but NOT part of the verify registry — each is the raw
    * listing form of an operator whose queries-map entry became a
    * verdict row (round 16), kept so the sweep keeps measuring the
    * production probe shape, not just the probe + its in-query
    * verification. No oracle by construction; the value-level
    * coverage is the verdict twin. */
  val benchOnly: Map[String, QueryFn] = Map(
    "q_decontaminate_bloom_scores" -> ((s, d) => {
      // the pre-r16 q_decontaminate_bloom: per-doc bloom contamination
      // scores — ONE corpus pass, no join on the corpus side
      val docs = t(s, d, "documents")
      val isEval = col("doc_id") % 97 === 0
      val model = graft.operators.Decontaminate
        .buildShingleBloom(docs, "doc_id", "text", isEval, n = 3)
      graft.operators.Decontaminate
        .bloomContamination(docs, "doc_id", "text", isEval, model,
          n = 3, threshold = 0.5)
        .orderBy("doc_id")
    }))
}
