package graft.core

/** Deterministic hashing / sketching kernel for the training-data pipeline
  * operators (dedup, fingerprinting): splitmix64, rolling document
  * fingerprint, MinHash, SimHash. Pure functions, no allocation in hot loops
  * beyond the returned arrays. Standard public constructions (splitmix64 from
  * Steele et al. "Fast Splittable Pseudorandom Number Generators"; MinHash
  * per Broder '97; SimHash per Charikar '02).
  */
object Fingerprint {

  /** splitmix64 finalizer — the universal 64-bit mixer. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit FNV-1a over UTF-8 bytes of a string — stable string hash
    * independent of JVM String.hashCode. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Rolling polynomial fingerprint of a document (base 257 over chars,
    * mixed) — a cheap order-sensitive content fingerprint (H-doc). */
  def docFingerprint(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) {
      h = 257L * h + s.charAt(i)
      i += 1
    }
    mix64(h)
  }

  /** Word k-shingles of tokenized text -> stable 64-bit shingle hashes. */
  def shingles(tokens: Array[String], k: Int): Array[Long] = {
    if (tokens.length < k) {
      if (tokens.isEmpty) Array.empty
      else Array(fnv1a64(tokens.mkString(" ")))
    } else {
      val out = new Array[Long](tokens.length - k + 1)
      var i = 0
      while (i + k <= tokens.length) {
        out(i) = fnv1a64(tokens.slice(i, i + k).mkString(" "))
        i += 1
      }
      out
    }
  }

  /** MinHash signature: numHashes permutations simulated by mixing each
    * shingle hash with a per-row seed. Empty input -> all Long.MaxValue. */
  def minhash(shingleHashes: Array[Long], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < shingleHashes.length) {
      val h = shingleHashes(i)
      var r = 0
      while (r < numHashes) {
        val v = mix64(h ^ (0x2545f4914f6cdd1dL * (r + 1)))
        if (v < sig(r)) sig(r) = v
        r += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band keys from a MinHash signature: hash of each band of `rowsPerBand`
    * consecutive signature values, tagged with band index in the top bits. */
  def lshBands(sig: Array[Long], rowsPerBand: Int): Array[Long] = {
    val nBands = sig.length / rowsPerBand
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = b.toLong * 0x9e3779b97f4a7c15L
      var r = 0
      while (r < rowsPerBand) {
        h = mix64(h ^ sig(b * rowsPerBand + r))
        r += 1
      }
      // reserve 8 top bits for band id so keys from different bands never collide
      out(b) = (b.toLong << 56) | (h >>> 8)
      b += 1
    }
    out
  }

  /** SimHash64 over token hashes (unweighted). */
  def simhash64(tokens: Array[String]): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val h = fnv1a64(tokens(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  @inline def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Winnowing fingerprints (Schleimer–Wilkerson–Aiken '03, the MOSS
    * algorithm): hash every char k-gram (rolling polynomial, mixed), then
    * from each window of `w` consecutive k-gram hashes select the minimum
    * (rightmost on ties), deduplicating consecutive selections. Guarantees:
    * any shared substring of length >= w + k - 1 yields at least one shared
    * fingerprint, while keeping ~2/(w+1) density. */
  def winnow(s: String, k: Int, w: Int): Array[Long] = {
    if (s == null || s.isEmpty) return Array.empty
    if (s.length < k) return Array(mix64(fnv1a64(s)))
    val n = s.length - k + 1
    val hs = new Array[Long](n)
    // rolling base-257 polynomial over chars; mix64 finalizes each gram
    var pow = 1L
    var j = 0
    while (j < k - 1) { pow *= 257L; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = 257L * h + s.charAt(i); i += 1 }
    hs(0) = mix64(h)
    i = 1
    while (i < n) {
      h = 257L * (h - s.charAt(i - 1) * pow) + s.charAt(i + k - 1)
      hs(i) = mix64(h)
      i += 1
    }
    if (n <= w) {
      // single window: emit its minimum
      var m = hs(0); i = 1
      while (i < n) { if (hs(i) <= m) m = hs(i); i += 1 }
      return Array(m)
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long](2 * n / (w + 1) + 4)
    var lastIdx = -1
    var start = 0
    while (start + w <= n) {
      // rightmost minimum in [start, start + w)
      var mIdx = start
      i = start + 1
      while (i < start + w) { if (hs(i) <= hs(mIdx)) mIdx = i; i += 1 }
      if (mIdx != lastIdx) { out += hs(mIdx); lastIdx = mIdx }
      start += 1
    }
    out.toArray
  }

  /** Exact Jaccard over two shingle-hash sets (test oracle for MinHash). */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val sa = a.toSet; val sb = b.toSet
    val inter = sa.intersect(sb).size
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }
}
