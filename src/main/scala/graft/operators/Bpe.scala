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

  /** Greedy BPE training over a (word, freq) table. Each round is a
    * vocab-sized aggregate; the only driver state is the 1-row winner
    * and the accumulated merge list (numMerges rows). */
  def train(words: DataFrame, numMerges: Int,
            wordCol: String = "word", freqCol: String = "freq"): Seq[Merge] = {
    require(numMerges > 0, s"numMerges must be > 0, got $numMerges")
    val spark = words.sparkSession
    graft.functions.GraftFunctions.register(spark)
    // initial symbols via the SAME codepoint splitter encode uses
    // (graft_bpe_encode with an empty merge table = chars) — a regex
    // split('') would keep a trailing "" and break surrogate pairs
    var syms = words.select(
        call_function("graft_bpe_encode", col(wordCol),
          typedLit(Seq.empty[String]), typedLit(Seq.empty[String]))
          .as("syms"),
        col(freqCol).cast("long").as("freq"))
      .filter(size(col("syms")) >= 2)
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var r = 0
    var done = false
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
        val next = syms.select(
            call_function("graft_bpe_merge", col("syms"), lit(l), lit(rr))
              .as("syms"), col("freq"))
          .filter(size(col("syms")) >= 2)
          .localCheckpoint(true)
        syms = next
        r += 1
      }
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
