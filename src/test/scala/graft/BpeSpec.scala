package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic Sennrich worked example (sans end-of-word marker):
  // low x5, lower x2, newest x6, widest x3
  private def corpus = Seq(
    (5L, "low"), (2L, "lower"), (6L, "newest"), (3L, "widest")
  ).toDF("freq", "word")

  test("train reproduces the hand-computed merge sequence") {
    val merges = Bpe.train(corpus, numMerges = 3)
    // pair counts round 1: es 9, st 9 (tie -> es first, pair asc),
    // lo 7, ow 7, we 8, ne 6, ew 6, er 2, wi 3, id 3, de 3
    assert(merges.map(m => (m.left, m.right, m.pairFreq)) == Seq(
      ("e", "s", 9L),   // newest 6 + widest 3
      ("es", "t", 9L),  // the new symbol immediately dominates
      ("l", "o", 7L)))  // low 5 + lower 2 (tie with o-w, pair asc)
    assert(merges.map(_.rank) == Seq(0, 1, 2))
  }

  test("train stops early when no pairs remain") {
    val tiny = Seq((4L, "ab")).toDF("freq", "word")
    val merges = Bpe.train(tiny, numMerges = 10)
    assert(merges.map(m => (m.left, m.right, m.pairFreq)) ==
      Seq(("a", "b", 4L)))
  }

  test("mergePass is left-to-right non-overlapping") {
    val df = Seq("aaa", "aaaa", "baab").toDF("word")
    val out = Bpe.encodeWords(df, "word",
        Seq(Bpe.Merge(0, "a", "a", 1L)))
      .select(col("word"), col("pieces")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(out("aaa") == List("aa", "a"))
    assert(out("aaaa") == List("aa", "aa"))
    assert(out("baab") == List("b", "aa", "b"))
  }

  test("encode folds merges in rank order") {
    val merges = Bpe.train(corpus, numMerges = 3)
    val out = Bpe.encodeWords(
        Seq("lowest", "low", "xyz", "").toDF("word"), "word", merges)
      .select(col("word"), col("pieces")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    // l o w e s t -> (e,s) -> (es,t) -> (l,o) = [lo, w, est]
    assert(out("lowest") == List("lo", "w", "est"))
    assert(out("low") == List("lo", "w"))
    assert(out("xyz") == List("x", "y", "z"))
    assert(out("") == Nil)
  }

  test("empty merge table = codepoint split (surrogates intact)") {
    val out = Bpe.encodeWords(
        Seq("ab😀c").toDF("word"), "word", Seq.empty)
      .select("pieces").collect()(0).getSeq[String](0).toList
    assert(out == List("a", "b", "😀", "c"))
  }

  test("tokenCounts: distinct-word encode matches direct fold") {
    val docs = Seq(
      (0L, "low low lower"),
      (1L, "newest widest lowest"),
      (2L, "low")
    ).toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val merges = Bpe.train(corpus, numMerges = 3)
    val got = Bpe.tokenCounts(docs, "doc_id", toks, merges)
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // doc0: low=2 pieces [lo,w] x2, lower=4 [lo,w,e,r] -> 3 words, 8
    // doc1: newest [n,e,w,est]=4, widest [w,i,d,est]=4,
    //       lowest [lo,w,est]=3 -> 3 words, 11
    // doc2: low -> 1 word, 2
    assert(got == List((0L, 3L, 8L), (1L, 3L, 11L), (2L, 1L, 2L)))
  }

  test("train is invariant to input partitioning") {
    val m1 = Bpe.train(corpus.repartition(1), numMerges = 4)
    val m7 = Bpe.train(corpus.repartition(7), numMerges = 4)
    assert(m1 == m7)
  }

  test("driver-local and distributed merge loops agree on the fixture") {
    val driver = Bpe.trainDriver(
      Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)),
      numMerges = 8)
    val dist = Bpe.trainDistributed(
      corpus.select(col("word"), col("freq")), numMerges = 8)
    assert(driver == dist)
    // and the public entry point (which dispatches driver-side at
    // this size) produces the same list
    assert(Bpe.train(corpus, numMerges = 8) == driver)
  }

  test("driver-local == distributed merge-for-merge on a generated corpus") {
    // pseudo-random words over a 5-letter alphabet with repeated
    // substructure (so merges chain, overlap cases like "aaa" occur,
    // and previously-exhausted pairs can re-form) — seeded, so the
    // corpus is deterministic
    val rng = new scala.util.Random(11)
    val alpha = "abcde"
    val wordsArr = (0 until 300).map { i =>
      val len = 2 + rng.nextInt(9)
      val w = (0 until len)
        .map(_ => alpha(rng.nextInt(alpha.length))).mkString
      (w, (1 + rng.nextInt(20)).toLong)
    }.groupBy(_._1).map { case (w, fs) => (w, fs.map(_._2).sum) }
      .toArray.sortBy(_._1)
    val driver = Bpe.trainDriver(wordsArr, numMerges = 40)
    val dist = Bpe.trainDistributed(
      wordsArr.toSeq.toDF("word", "freq"), numMerges = 40)
    assert(driver.size == dist.size)
    driver.zip(dist).foreach { case (d, t) => assert(d == t) }
  }

  test("zero/negative-frequency words produce no merges in EITHER " +
    "regime (dispatch transparency on degenerate freqCol values)") {
    // a zero-freq pair would be invisible to the driver loop's
    // positive-count tree but still win the distributed argmax —
    // train() filters freq > 0 before the regime split so both see
    // the same corpus
    val words = Seq(("ab", 0L), ("xy", -3L), ("cd", 2L))
      .toDF("word", "freq")
    val viaDriver = Bpe.train(words, numMerges = 3)
    val viaDist = Bpe.train(words, numMerges = 3, maxDriverWords = 0L)
    assert(viaDriver == viaDist)
    assert(viaDriver.map(m => (m.left, m.right)) == Seq(("c", "d")),
      s"only the freq-2 word may merge, got $viaDriver")
    // all-degenerate input: the corpus is EMPTY after the filter, so
    // BOTH dispatch configs take the driver loop (0 <= any bound) —
    // pin the distributed fallback's empty behavior DIRECTLY too, so
    // the empty-corpus path isn't covered only vacuously
    val none = Seq(("ab", 0L)).toDF("word", "freq")
    assert(Bpe.train(none, 1).isEmpty)
    assert(Bpe.train(none, 1, maxDriverWords = 0L).isEmpty)
    assert(Bpe.trainDistributed(
      Seq.empty[(String, Long)].toDF("word", "freq"), 1).isEmpty)
  }

  test("over-bound dispatch falls back to the distributed rounds") {
    // maxDriverWords = 0 forces the fallback; the result must not
    // change (the dispatch is a transport choice, not a semantics one)
    val viaDist = Bpe.train(corpus, numMerges = 3, maxDriverWords = 0L)
    val viaDriver = Bpe.train(corpus, numMerges = 3)
    assert(viaDist == viaDriver)
  }

  test("driver loop handles surrogate pairs and multi-occurrence words") {
    val words = Array(("😀a😀a", 4L), ("aaa", 3L), ("a😀", 2L))
    val driver = Bpe.trainDriver(words, numMerges = 5)
    val dist = Bpe.trainDistributed(
      words.toSeq.toDF("word", "freq"), numMerges = 5)
    assert(driver == dist)
  }
}
