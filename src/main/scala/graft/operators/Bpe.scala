package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and APPLICATION at corpus
  * scale (Sennrich et al. 2016 — the algorithm behind GPT-2/RoBERTa
  * vocabularies; every LLM data pipeline runs it or its output).
  *
  * The scale insight both halves lean on: BPE never needs the corpus
  * per merge round — it needs the WORD-FREQUENCY TABLE, which is
  * vocabulary-sized (Heaps' law: ~10^6-10^7 distinct words at 100 TB,
  * vs 10^13 tokens). So:
  *
  *  - train: ONE corpus pass builds (word, freq); every one of the
  *    `numMerges` rounds is then a vocab-sized job — explode adjacent
  *    symbol pairs weighted by freq, partial+final aggregate, take
  *    the 1-row argmax back to the driver (bounded: one pair), apply
  *    it with the codegen `graft_bpe_merge` literal expression.
  *    localCheckpoint truncates the per-round lineage so round r's
  *    plan never replays rounds 1..r-1.
  *  - encode: the learned merge table rides into `graft_bpe_encode`
  *    as two parallel array literals; it runs once per DISTINCT word,
  *    and the corpus is re-tokenized by a broadcast join against the
  *    resulting (word -> n_pieces) table — per-occurrence cost is a
  *    hash probe, not a merge fold.
  *
  * Determinism: the argmax tie-breaks on (count desc, left asc,
  * right asc), so the merge list is a pure function of the corpus —
  * partitioning cannot change it.
  */
object Bpe {

  /** One learned merge: `left + right -> left ++ right`, with the
    * pair's weighted frequency at the time it won its round. */
  final case class Merge(rank: Int, left: String, right: String,
                         pairFreq: Long)

  /** Word-frequency table: the ONE corpus-wide shuffle in training. */
  def wordFreq(docs: DataFrame, toks: Column): DataFrame =
    docs.select(explode(toks).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Word-freq tables at or below this row count train driver-side
    * (the Heaps'-law case: even a 100 TB corpus yields ~10^6-10^7
    * distinct words ≈ hundreds of MB — it FITS, and the classic
    * incremental-pair-count loop runs tens of thousands of merges in
    * seconds where the distributed rounds would schedule ~2 jobs +
    * one block-store checkpoint PER MERGE: scheduler-bound for days
    * at a GPT-2-scale 30k-merge vocabulary, independent of cluster
    * size). Same stance as pqTrain's lloydDriver and ModelFit's
    * driver-side Cramer: the reduction is distributed, the iteration
    * is driver-local once the state is provably bounded. */
  val DriverTrainMaxWords: Long = 8L * 1000 * 1000

  /** Greedy BPE training over a (word, freq) table.
    *
    * Two regimes, merge-for-merge identical (BpeSpec pins parity):
    *  - vocab fits [[DriverTrainMaxWords]] (always, in practice):
    *    collect the (word, freq) table ONCE and run the incremental
    *    driver loop — per merge, only the words that contain the
    *    winning pair update their pair counts ([[trainDriver]]).
    *  - over-bound fallback: the distributed rounds — each merge is
    *    a vocab-sized aggregate + 1-row argmax ([[trainDistributed]]).
    */
  def train(words: DataFrame, numMerges: Int,
            wordCol: String = "word", freqCol: String = "freq",
            maxDriverWords: Long = DriverTrainMaxWords): Seq[Merge] = {
    require(numMerges > 0, s"numMerges must be > 0, got $numMerges")
    // materialize the vocab-sized reduction once; both regimes (and
    // the distributed path's per-round lineage truncation) reuse it
    // freq > 0 (not just non-null): a zero/negative-frequency word
    // can never legitimately win a merge, but the two regimes would
    // DIVERGE on it — the driver loop's positive-count tree simply
    // never holds it, while the distributed argmax would still emit
    // a count<=0 pair — so the dispatch-transparency contract
    // (driver == distributed merge-for-merge) demands it is dropped
    // before the regime split
    // persist, not localCheckpoint: the count + collect (or the
    // distributed rounds' first pass) reuse the one materialization,
    // without an eager extra job before the regime dispatch; released
    // once training returns (the result is a plain driver Seq)
    val wf = words.select(col(wordCol).cast("string").as("word"),
        col(freqCol).cast("long").as("freq"))
      .filter(col("freq") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = wf.count()
      if (n <= maxDriverWords) {
        val spark = wf.sparkSession
        import spark.implicits._
        trainDriver(wf.as[(String, Long)].collect(), numMerges)
      } else trainDistributed(wf, numMerges, rowCount = Some(n))
    } finally wf.unpersist()
  }

  /** The distributed merge rounds — the over-bound fallback. Each
    * round: explode adjacent symbol pairs weighted by freq,
    * partial+final aggregate, 1-row argmax to the driver, apply the
    * winner with the codegen `graft_bpe_merge` literal (fused lazily
    * into the next round's scan; lineage truncated every few rounds —
    * see the cadence note below — so round r never replays rounds
    * 1..r-1 beyond the current fusion window). ~1 scheduled job per
    * merge plus a truncation job per cadence — fine for bench-sized
    * merge counts, the reason [[trainDriver]] exists for production
    * vocabularies. */
  private[graft] def trainDistributed(words: DataFrame,
                                      numMerges: Int,
                                      rowCount: Option[Long] = None)
  : Seq[Merge] = {
    val spark = words.sparkSession
    graft.functions.GraftFunctions.register(spark)
    // SCALE-ADAPTIVE partitioning for the iterated state (guide §2.2,
    // §2.5): the vocab table inherits the corpus shuffle's partition
    // count, but every round then schedules that many tasks per job
    // over rows that fit a handful of partitions (Heaps' law keeps
    // |vocab| ≲ 10^7 even at 100 TB). Sized from the ROW COUNT
    // (~500k words each), capped at defaultParallelism. NOTE this
    // coalesce only TRIMS excess tasks — it never raises the partition
    // count when the input arrives narrower than `parts` (coalesce
    // cannot add spread, and paying a repartition shuffle to spread a
    // vocab-sized table across 16 scans costs more than the narrow
    // scans do).
    // `rowCount` lets the regime dispatcher (train) pass the count it
    // already paid for instead of re-scanning the input.
    val nWords = rowCount.getOrElse(words.count())
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      nWords / 500000L + 1L)).toInt
    // initial symbols via the SAME codepoint splitter encode uses
    // (graft_bpe_encode with an empty merge table = chars) — a regex
    // split('') would keep a trailing "" and break surrogate pairs
    var syms = words.select(
        call_function("graft_bpe_encode", col("word"),
          typedLit(Seq.empty[String]), typedLit(Seq.empty[String]))
          .as("syms"),
        col("freq"))
      .filter(size(col("syms")) >= 2)
      .coalesce(parts)
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var r = 0
    var done = false
    // Lineage-truncation CADENCE, not per-round truncation: applying a
    // merge is one cheap codegen kernel per row, so letting a few
    // rounds' merge projections fuse lazily into the next round's
    // count scan costs O(CheckpointEvery) extra kernel calls per row —
    // while checkpointing every round costs a FULL extra scheduled job
    // per merge (materialize + block store). Bit-parity is untouched:
    // the same kernels run in the same order, eagerly or fused
    // (dispatch-transparency spec). The plan still cannot grow
    // unboundedly — every CheckpointEvery-th round truncates.
    val CheckpointEvery = 4
    var sinceCkpt = 0
    while (r < numMerges && !done) {
      // adjacent pairs weighted by word freq; words already fully
      // merged into one symbol carry no pairs and drop out of the scan
      val win = syms
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS l, syms[i + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("c"))
        .orderBy(desc("c"), asc("l"), asc("r"))
        .limit(1).collect()
      if (win.isEmpty) done = true
      else {
        val (l, rr, c) = (win(0).getString(0), win(0).getString(1),
          win(0).getLong(2))
        merges += Merge(r, l, rr, c)
        r += 1
        // the FINAL winning pair is never applied: the merge table is
        // complete and no later round reads the merged symbols —
        // applying + checkpointing it was one whole wasted job per
        // training call
        if (r < numMerges) {
          val next = syms.select(
              call_function("graft_bpe_merge", col("syms"), lit(l), lit(rr))
                .as("syms"), col("freq"))
            .filter(size(col("syms")) >= 2)
          sinceCkpt += 1
          syms =
            if (sinceCkpt >= CheckpointEvery) {
              sinceCkpt = 0; next.localCheckpoint(true)
            } else next
        }
      }
    }
    merges.result()
  }

  /** The driver-local incremental merge loop (Sennrich's reference
    * shape): pair counts + an inverted pair→words index + an ordered
    * set for the argmax. Per merge, only words CONTAINING the winner
    * touch the counts — O(affected symbols · log |pairs|), not a
    * distributed job. Bit-parity with [[trainDistributed]]:
    *  - symbols come from the same [[graft.functions.BpeKernels]]
    *    codepoint splitter and non-overlapping mergePass;
    *  - counts are the same overlap-counting adjacent-pair sums
    *    (`"aaa"` contributes (a,a) twice);
    *  - the argmax tie-breaks (count desc, left asc, right asc) with
    *    UTF8String's binary comparator — the exact ordering Spark's
    *    `asc` gives the distributed argmax.
    * Index entries are lazy (never removed when a pair is destroyed);
    * a winner's candidate list is re-validated against the live word
    * before it is touched, and a pair that re-forms later (possible:
    * a merged symbol can recreate a previously-exhausted adjacency)
    * simply re-enters the structures. */
  private[graft] def trainDriver(words: Array[(String, Long)],
                                 numMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.BpeKernels
    import org.apache.spark.sql.catalyst.util.GenericArrayData

    def symsOf(w: String): Array[UTF8String] = {
      val a = BpeKernels.chars(UTF8String.fromString(w))
      val out = new Array[UTF8String](a.numElements())
      var i = 0
      while (i < out.length) { out(i) = a.getUTF8String(i); i += 1 }
      out
    }
    // reuse the codegen kernel's mergePass so driver merges are the
    // same non-overlapping left-to-right pass bit for bit
    def mergeWord(s: Array[UTF8String], l: UTF8String,
                  r: UTF8String): Array[UTF8String] = {
      val out = BpeKernels.mergePass(
        new GenericArrayData(s.asInstanceOf[Array[AnyRef]]), l, r)
      val res = new Array[UTF8String](out.numElements())
      var i = 0
      while (i < res.length) { res(i) = out.getUTF8String(i); i += 1 }
      res
    }
    def hasPair(s: Array[UTF8String], l: UTF8String,
                r: UTF8String): Boolean = {
      var i = 0
      while (i + 1 < s.length) {
        if (s(i).equals(l) && s(i + 1).equals(r)) return true
        i += 1
      }
      false
    }

    type Pair = (UTF8String, UTF8String)
    val syms = mutable.ArrayBuffer.empty[Array[UTF8String]]
    val freqs = mutable.ArrayBuffer.empty[Long]
    words.foreach { case (w, f) =>
      if (w != null) {
        val a = symsOf(w)
        if (a.length >= 2) { syms += a; freqs += f }
      }
    }
    val counts = mutable.HashMap.empty[Pair, Long]
    val occurs = mutable.HashMap.empty[Pair, mutable.ArrayBuffer[Int]]
    // (count desc, left asc, right asc) — head is the round's winner
    implicit val ord: Ordering[(Long, UTF8String, UTF8String)] =
      new Ordering[(Long, UTF8String, UTF8String)] {
        def compare(a: (Long, UTF8String, UTF8String),
                    b: (Long, UTF8String, UTF8String)): Int = {
          val c = java.lang.Long.compare(b._1, a._1)
          if (c != 0) return c
          val lc = a._2.compareTo(b._2)
          if (lc != 0) lc else a._3.compareTo(b._3)
        }
      }
    val tree = mutable.TreeSet.empty[(Long, UTF8String, UTF8String)]
    def bump(p: Pair, delta: Long): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old != 0L) tree.remove((old, p._1, p._2))
      val nu = old + delta
      if (nu > 0L) { counts(p) = nu; tree.add((nu, p._1, p._2)) }
      else counts.remove(p)
    }
    def addOccur(p: Pair, wi: Int): Unit =
      occurs.getOrElseUpdate(p, mutable.ArrayBuffer.empty[Int]) += wi

    var wi = 0
    while (wi < syms.length) {
      val s = syms(wi)
      val f = freqs(wi)
      val seenHere = mutable.HashSet.empty[Pair]
      var i = 0
      while (i + 1 < s.length) {
        val p = (s(i), s(i + 1))
        bump(p, f)
        if (seenHere.add(p)) addOccur(p, wi)
        i += 1
      }
      wi += 1
    }

    val merges = Seq.newBuilder[Merge]
    var r = 0
    while (r < numMerges && tree.nonEmpty) {
      val (c, l, rr) = tree.head
      merges += Merge(r, l.toString, rr.toString, c)
      val merged = UTF8String.concat(l, rr)
      val cand = occurs.remove((l, rr))
        .getOrElse(mutable.ArrayBuffer.empty[Int])
      val seenWord = mutable.HashSet.empty[Int]
      cand.foreach { w =>
        if (seenWord.add(w) && hasPair(syms(w), l, rr)) {
          val s = syms(w)
          val f = freqs(w)
          var i = 0
          while (i + 1 < s.length) { bump((s(i), s(i + 1)), -f); i += 1 }
          val ns = mergeWord(s, l, rr)
          syms(w) = ns
          val seenHere = mutable.HashSet.empty[Pair]
          var j = 0
          while (j + 1 < ns.length) {
            val np = (ns(j), ns(j + 1))
            bump(np, f)
            // only pairs touching the freshly merged symbol can be
            // NEW in this word; pre-existing pairs keep their index
            // entries
            if ((np._1.equals(merged) || np._2.equals(merged)) &&
                seenHere.add(np)) addOccur(np, w)
            j += 1
          }
        }
      }
      r += 1
    }
    merges.result()
  }

  /** Tokenize a word column with a learned merge list — the codegen
    * fold over the literal merge table. Meant for vocab-sized inputs
    * (distinct words); see [[tokenCounts]] for the corpus pattern. */
  def encodeWords(words: DataFrame, wordCol: String,
                  merges: Seq[Merge]): DataFrame = {
    graft.functions.GraftFunctions.register(words.sparkSession)
    words.withColumn("pieces",
      call_function("graft_bpe_encode", col(wordCol),
        typedLit(merges.map(_.left)), typedLit(merges.map(_.right))))
  }

  /** Per-document BPE token counts: encode once per DISTINCT word,
    * then broadcast the (word -> n_pieces) table back onto the
    * per-doc term frequencies. The expensive merge fold runs
    * vocab-many times total, never corpus-many; the corpus-side cost
    * is one groupBy and a broadcast hash probe. Output:
    * (doc, n_words, n_bpe_tokens). */
  def tokenCounts(docs: DataFrame, idCol: String, toks: Column,
                  merges: Seq[Merge]): DataFrame = {
    val tf = docs.select(col(idCol).as("doc"), explode(toks).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("doc", "word").agg(count(lit(1)).as("tf"))
    val pieces = encodeWords(
        tf.select("word").distinct(), "word", merges)
      .select(col("word"), size(col("pieces")).cast("long").as("n_pieces"))
    tf.join(broadcast(pieces), "word")
      .groupBy(col("doc"))
      .agg(sum("tf").cast("long").as("n_words"),
        sum(col("tf") * col("n_pieces")).cast("long").as("n_bpe_tokens"))
  }
}
