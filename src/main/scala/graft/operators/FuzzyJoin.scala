package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Set-similarity-style fuzzy (edit-distance) self-join — the
  * prefix-filtering family (SSJoin / ED-Join): candidate pairs come
  * from an EQUI-join on rare q-grams, never from a string cross join,
  * so the operator scales like a token join, not like |R|².
  *
  * Losslessness argument, spelled out because the driver oracle IS a
  * brute-force cross join and any dropped pair hash-mismatches:
  * if ed(a,b) <= k then the occurrence-tagged q-gram sets share at
  * least t = max(|G_a|,|G_b|) − k·q elements (each edit destroys at
  * most q grams). Order ALL grams by one global total order (ascending
  * document frequency, then gram text — rarest first); if two sets
  * share t >= 1 elements, their prefixes of size |G| − t + 1 must
  * intersect, and |G_a| − t + 1 <= k·q + 1 always. So joining on the
  * k·q+1 RAREST grams of each string finds every pair whose longer
  * string has more than k·q grams (if the shorter side has |G_a| < t,
  * the pair cannot be within distance k at all). The only pairs
  * outside the theorem are those where BOTH strings have <= k·q grams;
  * they are routed through an exact short×short length-banded fallback
  * (such strings can be within distance k while sharing zero grams).
  *
  * Scale: gram df is one aggregation; prefix selection is a window
  * partitioned by string id; the candidate join keys on the rarest
  * grams, whose document frequency is bounded by construction — the
  * frequent grams that would cause quadratic join skew are exactly the
  * ones the prefix ordering pushes out of the k·q+1 window.
  * Verification is a per-candidate `levenshtein` (codegen'd) behind an
  * exact |Δlen| <= k length filter.
  */
object FuzzyJoin {

  /** All (id_a < id_b, dist) pairs with levenshtein(s_a, s_b) <= maxDist.
    * Ids must be integral and unique; null/too-short strings (< q
    * chars, gram-less) are excluded — they cannot carry q-grams and a
    * corpus that needs them fuzzily matched should pad or lower q.
    */
  def edSelfJoin(df: DataFrame, idCol: String, strCol: String,
                 maxDist: Int, q: Int = 3,
                 persistBase: Boolean = true): DataFrame = {
    require(maxDist >= 1, s"maxDist=$maxDist must be >= 1")
    require(q >= 2, s"q=$q must be >= 2")
    val prefixLen = maxDist * q + 1

    val base0 = df.select(col(idCol).cast("long").as("id"),
        col(strCol).as("s"))
      .filter(col("s").isNotNull && length(col("s")) >= q)
    val base =
      if (persistBase) base0.persist(StorageLevel.MEMORY_AND_DISK)
      else base0

    // occurrence-tagged q-grams: (id, gram#occ) — the occ tag makes
    // the prefix sets multiset-correct (a string with "abcabc" carries
    // "abc#1" and "abc#2" as distinct joinable elements)
    val grams = base
      .select(col("id"),
        posexplode(expr(s"transform(sequence(1, length(s) - ${q - 1})," +
          s" i -> substring(s, i, $q))")).as(Seq("pos", "g0")))
      .withColumn("occ",
        row_number().over(Window.partitionBy("id", "g0").orderBy("pos")))
      .select(col("id"), concat(col("g0"), lit("#"), col("occ")).as("g"))

    // global rarity order (ascending df, gram text as tiebreak), then
    // each string keeps only its k·q+1 rarest grams; short strings
    // keep all of theirs, which the theorem shows is sufficient
    val dfreq = grams.groupBy("g").agg(count(lit(1)).as("gdf"))
    val prefixes = grams.join(dfreq, "g")
      .withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy(col("gdf"), col("g"))))
      .filter(col("rk") <= prefixLen)
      .select("id", "g")
    val candLong = prefixes.as("a").join(prefixes.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))

    // short×short fallback (both sides <= maxDist·q grams): banded on
    // length div (maxDist+1) — |Δlen| <= maxDist keeps bands within
    // ±1, so probing each string at {band-1, band, band+1} and
    // EQUI-joining on the band finds every short pair (a non-equi
    // |Δband| <= 1 predicate would plan as a nested-loop join). The
    // set is small by construction (strings under (maxDist+1)·q
    // chars), so the 3× probe fan-out is a rounding error.
    val short = base
      .filter(length(col("s")) - (q - 1) <= maxDist * q)
      .select(col("id"), expr(s"length(s) div ${maxDist + 1}").as("band"))
    val probes = short.select(col("id"),
      explode(array(col("band") - 1, col("band"), col("band") + 1))
        .as("band"))
    val candShort = probes.as("a").join(short.as("b"), "band")
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))

    val cand = candLong.unionAll(candShort).distinct()
    val out = cand
      .join(base.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
    if (persistBase) {
      // materialize before releasing the staged base (zero residue)
      val done = out.localCheckpoint()
      base.unpersist()
      done
    } else out
  }
}
