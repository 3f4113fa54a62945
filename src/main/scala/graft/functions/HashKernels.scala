package graft.functions


/** One-pass hash kernels for the dedup sketches.
  *
  * The pure-expression forms (64 `aggregate` folds for simhash, 32 for
  * minhash) re-hash every token once PER SIGNATURE POSITION — 64x/32x
  * redundant hashing that dominated the sf0.1 bench. These kernels hash
  * each token exactly once and derive all positions by mixing the one
  * hash with the position index (standard one-permutation trick), so
  * cost is O(tokens + positions) per row instead of
  * O(tokens * positions).
  *
  * Scale note: per-row, no shuffle, fully data-parallel; the single
  * black-box call per row is far cheaper than 64 codegen'd array
  * traversals. Deterministic (no seed state), so safe under task retry.
  */
object HashKernels {

  /** 64-bit FNV-1a over a string's UTF-16 chars — stable across JVMs. */
  @inline private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — decorrelates the per-position variants. */
  @inline private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** SimHash64: per bit, sign of the +/-1 vote over token hashes.
    * Token multiplicity honoured; empty tokens carry no signal. */
  def simhash64(tokens: Seq[String]): Long = {
    val counts = new Array[Int](64)
    tokens.foreach { t =>
      if (t != null && t.nonEmpty) {
        val h = fnv64(t)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  /** MinHash signature: nHashes minima over mix(h, i) variants of each
    * element's single FNV hash. */
  def minhash(elems: Seq[String], nHashes: Int): Array[Long] = {
    val mins = Array.fill(nHashes)(Long.MaxValue)
    elems.foreach { e =>
      if (e != null) {
        val h = fnv64(e)
        var i = 0
        while (i < nHashes) {
          val v = mix(h ^ (i.toLong * 0x9e3779b97f4a7c15L))
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
    }
    mins
  }

  /** LSH band hashes straight from the kernel: band b's `rows` minima
    * mixed into one 64-bit bucket key. Returned as ONE array so the
    * plan feeds a single generator — computing 8 per-band structs as
    * separate projections lets CollapseProject inline the whole
    * signature computation once PER BAND (measured 8x slowdown). */
  def minhashBands(elems: Seq[String], bands: Int, rows: Int): Array[Long] = {
    val mins = minhash(elems, bands * rows)
    Array.tabulate(bands) { b =>
      var h = 0x9e3779b97f4a7c15L * (b + 1)
      var i = 0
      while (i < rows) {
        h = mix(h ^ mins(b * rows + i))
        i += 1
      }
      h
    }
  }

  // ---- ArrayData entry points for the native Catalyst expressions ----
  // Same hash values as the Seq[String] forms (UTF-16 char hashing via
  // toString), but called straight from generated code with no
  // Catalyst->Scala Seq conversion and no ScalaUDF codegen boundary.
  // Scala objects emit static forwarders, so generated Java calls
  // graft.functions.HashKernels.simhash64Data(...) directly.

  def simhash64Data(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i).toString
        if (t.nonEmpty) {
          val h = fnv64(t)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  def minhashData(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                  nHashes: Int): Array[Long] = {
    val mins = Array.fill(nHashes)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = fnv64(arr.getUTF8String(j).toString)
        var i = 0
        while (i < nHashes) {
          val v = mix(h ^ (i.toLong * 0x9e3779b97f4a7c15L))
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    mins
  }

  def minhashBandsData(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                       bands: Int, rows: Int): Array[Long] = {
    val mins = minhashData(arr, bands * rows)
    Array.tabulate(bands) { b =>
      var h = 0x9e3779b97f4a7c15L * (b + 1)
      var i = 0
      while (i < rows) {
        h = mix(h ^ mins(b * rows + i))
        i += 1
      }
      h
    }
  }

  /** 64-bit perceptual hash (aHash) of an opaque binary payload: the
    * bytes fold into a deterministic 8×8 "grid" of 64 contiguous
    * stripes — the stubbed stand-in for decode→resize→luminance, same
    * contract: a LOCAL payload edit perturbs few cells — and bit k is
    * `cell-k mean > mean of cell means`. Hamming distance between two
    * payloads' hashes then approximates perceptual distance, so the
    * simhash band join applies unchanged to image/audio blobs.
    * Empty payloads hash to 0. One pass, no allocation beyond the two
    * 64-slot accumulators, deterministic (retry-safe).
    */
  def phash64(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val sums = new Array[Long](64)
    val cnts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val cell = (i.toLong * 64L / n).toInt
      sums(cell) += (bytes(i) & 0xff)
      cnts(cell) += 1
      i += 1
    }
    var total = 0.0d
    var used = 0
    var k = 0
    while (k < 64) {
      if (cnts(k) > 0) { total += sums(k).toDouble / cnts(k); used += 1 }
      k += 1
    }
    val mean = total / used
    var h = 0L
    k = 0
    while (k < 64) {
      if (cnts(k) > 0 && sums(k).toDouble / cnts(k) > mean) h |= (1L << k)
      k += 1
    }
    h
  }
}
