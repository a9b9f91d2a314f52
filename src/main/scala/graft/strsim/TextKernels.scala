package graft.strsim

import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM text-analysis kernels for the training-data operators
  * (document fingerprinting + SimHash near-dup signatures). Like
  * [[StrSimKernels]], these are static methods designed to be called from
  * whole-stage codegen with zero boxing.
  *
  * All hashes are self-contained splitmix64-based (deterministic across
  * JVMs, no dependence on JVM String.hashCode).
  */
object TextKernels {

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Hash of the UTF-8 bytes in [from, until): FNV-1a 64 folded through
    * splitmix (cheap, rolling-friendly enough for token hashing). */
  private def bytesHash(s: UTF8String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h = (h ^ (s.getByte(i) & 0xFFL)) * 0x100000001b3L
      i += 1
    }
    mix(h)
  }

  /** THE whitespace class for every tokenizer in this file: Java-regex \s
    * over ASCII (space, \t, \n, \x0B vertical tab, \f, \r) — identical to
    * `TextAnalysis.tokens`' `split("\\s+")` and to [[simhash60Sha]], so the
    * production and sha verification families can never tokenize the same
    * text differently (a one-byte divergence here would silently split
    * near-dup buckets on \x0B-bearing text). NOTE: RE2's \s EXCLUDES \x0B,
    * so SQL oracles must spell this set as the explicit class
    * `[ \t\n\x0b\f\r]+` — the driver oracles do — rather than '\s'. */
  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r' || b == '\f' || b == 0x0B

  /** 64-bit SimHash over whitespace tokens: each token hash votes ±1 per
    * bit; the signature bit is the vote sign. Near-duplicate documents get
    * signatures within a small Hamming distance. */
  def simhash64(text: UTF8String): Long = {
    val nb = text.numBytes
    val votes = new Array[Int](64) // per-row alloc is fine: 256B, escape-analyzed
    var i = 0
    while (i < nb) {
      while (i < nb && isSpace(text.getByte(i))) i += 1
      val start = i
      while (i < nb && !isSpace(text.getByte(i))) i += 1
      if (i > start) {
        val h = bytesHash(text, start, i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** 60-bit SimHash over whitespace tokens where the per-token hash is the
    * top 60 bits (first 15 hex chars) of sha256(token) — every ingredient
    * is ANSI-SQL-reproducible, which is what lets the driver gate
    * hash-check the simhash dedup pipeline against DuckDB. Same vote
    * semantics as [[simhash64]]: token hash votes ±1 per bit, bit set iff
    * votes > 0. Result is non-negative (bit 60+ never set). */
  private val shaDigest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("SHA-256"))

  def simhash60Sha(text: UTF8String): Long = {
    // thread-local digest: getInstance per row would pay the JCA provider
    // lookup + allocation inside the codegen hot loop
    val md = shaDigest.get()
    val bytes = text.getBytes
    val nb = bytes.length
    val votes = new Array[Int](60)
    var i = 0
    while (i < nb) {
      while (i < nb && isSpace(bytes(i))) i += 1
      val start = i
      while (i < nb && !isSpace(bytes(i))) i += 1
      if (i > start) {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        // big-endian value of the first 8 bytes, low nibble dropped =
        // the integer the first 15 hex chars spell
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xFFL); k += 1 }
        h = h >>> 4
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Document fingerprint: minimum rolling hash over all byte k-grams
    * (w-shingling / Rabin-Karp style). Documents sharing long runs of
    * identical bytes collide on fingerprints with high probability.
    * Whole-string hash when shorter than k. */
  def minKGramHash(text: UTF8String, k: Int): Long = {
    val nb = text.numBytes
    if (nb <= k) return bytesHash(text, 0, nb)
    // rolling polynomial hash base B over bytes, window k, then mix
    val B = 0x100000001b3L
    var bk = 1L // B^k
    var i = 0
    while (i < k) { bk *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (text.getByte(i) & 0xFFL); i += 1 }
    var minH = mix(h)
    while (i < nb) {
      h = h * B + (text.getByte(i) & 0xFFL) - bk * (text.getByte(i - k) & 0xFFL)
      val m = mix(h)
      if (m < minH) minH = m
      i += 1
    }
    minH
  }
}
