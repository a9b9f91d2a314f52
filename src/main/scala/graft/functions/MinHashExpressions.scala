package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature kernels.
  *
  * Why fused kernels and not `explode(shingles) → groupBy(id).agg(min×k)`:
  * the exploded form shuffles every shingle row through a wide partial
  * aggregate — at 100 TB that is a full extra pass over a multiplied
  * corpus. These kernels compute the whole k-hash signature per document
  * inside whole-stage codegen: no explode, no aggregate, no shuffle; the
  * signature projection pipelines straight out of the scan.
  *
  * Two hash families:
  *  - `xxhash64` (production): token/shingle bytes through XXH64, per-hash
  *    lane derived with one extra hashLong — cheapest per shingle.
  *  - `sha256` (verification): lane i of shingle `sh` is the hex digest of
  *    the string "i:sh", and the lane minimum is the lexicographic min of
  *    hex strings. This is EXACTLY `min(sha256(i || ':' || sh))` in
  *    DuckDB/ANSI SQL (hex is byte-monotone), which is what makes the
  *    whole LSH dedup pipeline oracle-checkable end-to-end — same
  *    algorithm, different hash family, swapped by one parameter.
  */
object MinHashKernels {

  private[graft] val shaDigest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-256"))

  /** Precomputed "i:" lane prefixes — allocated once, not per shingle
    * per lane. Bounds the lane count; plenty for any real signature. */
  private val MaxLanes = 256
  private val lanePrefix: Array[Array[Byte]] =
    Array.tabulate(MaxLanes)(i => s"$i:".getBytes("US-ASCII"))

  private[graft] def requireLanes(k: Int): Unit =
    require(k > 0 && k <= MaxLanes, s"numHashes must be in [1, $MaxLanes], got $k")

  private val HexChars = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HexChars((bytes(i) >>> 4) & 0xF).toByte
      out(2 * i + 1) = HexChars(bytes(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** unsigned byte-wise compare (== hex-string lexicographic order) */
  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  /** sha256 lane digests of "i:" + shingle-bytes for i in [0, k), folded
    * into the running minima. The shingle arrives as (bytes, segments of
    * [start, end)) so callers never materialize a concatenated string. */
  private def shaLanesBytes(k: Int, mins: Array[Array[Byte]])(
      feed: MessageDigest => Unit): Unit = {
    val md = shaDigest.get()
    var i = 0
    while (i < k) {
      md.reset()
      md.update(lanePrefix(i))
      feed(md)
      val d = md.digest()
      if (mins(i) == null || lessThan(d, mins(i))) mins(i) = d
      i += 1
    }
  }

  private def xxLanes(shingleHash: Long, k: Int, mins: Array[Long]): Unit = {
    var i = 0
    while (i < k) {
      val h = XXH64.hashLong(shingleHash, i.toLong)
      if (h < mins(i)) mins(i) = h
      i += 1
    }
  }

  // ------------------------------------------------------- token 2-shingles

  /** Null array elements are SKIPPED (shingles pair consecutive non-null
    * tokens, as if the nulls were filtered out first), and a token-less
    * row — empty array, or all elements null — returns null rather than a
    * degenerate constant signature: k lanes of Long.MaxValue would make
    * every token-less document band-collide with every other as a
    * "near-dup", and a raw getUTF8String on a null slot would NPE the
    * executor on data (minhash_sig is SQL-registered, so inputs are not
    * guaranteed pre-filtered the way Dedup/Linkage pre-filter theirs). */
  private def nonNullTokens(tokens: ArrayData): Array[UTF8String] = {
    val n = tokens.numElements()
    val out = new Array[UTF8String](n)
    var m = 0
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) { out(m) = tokens.getUTF8String(j); m += 1 }
      j += 1
    }
    if (m == n) out else java.util.Arrays.copyOf(out, m)
  }

  /** xxhash64-family signature over token 2-shingles (tokens themselves
    * when fewer than 2 tokens). Returns array<long> of length k, or null
    * for a token-less row (see [[nonNullTokens]]). */
  def sigTokensXx(tokens: ArrayData, k: Int): ArrayData = {
    val toks = nonNullTokens(tokens)
    val n = toks.length
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    if (n == 1) {
      xxLanes(XXH64.hashUTF8String(toks(0), 42L), k, mins)
    } else {
      var prev = XXH64.hashUTF8String(toks(0), 42L)
      var j = 1
      while (j < n) {
        val cur = XXH64.hashUTF8String(toks(j), 42L)
        xxLanes(XXH64.hashLong(cur, prev), k, mins)
        prev = cur
        j += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** sha256-family signature over token 2-shingles; shingle string is
    * `tok_j ++ " " ++ tok_{j+1}` (tokens themselves when fewer than 2).
    * Returns array<string> of k lowercase hex digests, or null for a
    * token-less row (see [[nonNullTokens]]). The digest is fed
    * segment-wise (prefix, tokA, " ", tokB) — no concatenated shingle
    * string is ever materialized. */
  def sigTokensSha(tokens: ArrayData, k: Int): ArrayData = {
    val toks = nonNullTokens(tokens)
    val n = toks.length
    if (n == 0) return null
    val mins = new Array[Array[Byte]](k)
    if (n == 1) {
      val tb = toks(0).getBytes
      shaLanesBytes(k, mins)(_.update(tb))
    } else {
      // token bytes materialized once per row, reused by both shingles
      // that touch each token and by all k lanes
      val tb = new Array[Array[Byte]](n)
      var j = 0
      while (j < n) { tb(j) = toks(j).getBytes; j += 1 }
      j = 0
      while (j < n - 1) {
        val a = tb(j)
        val b = tb(j + 1)
        shaLanesBytes(k, mins) { md => md.update(a); md.update(' '.toByte); md.update(b) }
        j += 1
      }
    }
    val out = new Array[AnyRef](k)
    var i = 0
    while (i < k) {
      out(i) = toHex(mins(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  // --------------------------------------------------------- char k-shingles

  /** Code-point k-gram shingle byte spans of `s` (whole string when
    * shorter than k code points). One O(L) pass records the code-point
    * boundary offsets, then each shingle is a (start, end) byte span —
    * per-shingle `substring` would rescan from byte 0 every time, turning
    * long-document fingerprinting O(L²). */
  private def foreachCharShingleSpan(s: UTF8String, shingleK: Int)(
      f: (Array[Byte], Int, Int) => Unit): Unit = {
    val bytes = s.getBytes
    val n = bytes.length
    val nChars = s.numChars()
    if (nChars < shingleK) { f(bytes, 0, n); return }
    val offs = new Array[Int](nChars + 1)
    var i = 0
    var c = 0
    while (i < n) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(c) = n
    var j = 0
    while (j <= nChars - shingleK) {
      f(bytes, offs(j), offs(j + shingleK))
      j += 1
    }
  }

  def sigCharsXx(s: UTF8String, shingleK: Int, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    foreachCharShingleSpan(s, shingleK) { (bytes, from, until) =>
      xxLanes(XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
        until - from, 42L), k, mins)
    }
    new GenericArrayData(mins)
  }

  def sigCharsSha(s: UTF8String, shingleK: Int, k: Int): ArrayData = {
    val mins = new Array[Array[Byte]](k)
    foreachCharShingleSpan(s, shingleK) { (bytes, from, until) =>
      shaLanesBytes(k, mins)(_.update(bytes, from, until - from))
    }
    val out = new Array[AnyRef](k)
    var i = 0
    while (i < k) {
      out(i) = if (mins(i) == null) UTF8String.EMPTY_UTF8 else toHex(mins(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  // --------------------------------------------- one-permutation hashing

  /** OPH bin count — fixed at 16 so the sha256 family's bin index is
    * exactly the FIRST HEX NIBBLE of the single per-shingle digest (a SQL
    * oracle re-derives it with strpos over the hex string) and the
    * xxhash64 family mirrors it with the hash's top nibble. */
  val OphBins = 16

  /** One-permutation MinHash over token 2-shingles, sha256 family
    * (Li-Owen-Zhang 2012; densified per Shrivastava-Li 2014): ONE digest
    * per shingle — O(m) per document where the classic k-lane signature
    * [[sigTokensSha]] is O(k·m) — bucketed by the digest's first hex
    * nibble, keeping the lexicographic-min digest per bin. An empty bin
    * borrows the nearest non-empty bin to the RIGHT (circular, distance
    * j ≥ 1) and TAGS the borrow as `hex ++ ":" ++ j`: two documents
    * collide on a densified bin iff they borrow the same minimum over the
    * same distance — the collision structure the densified-OPH Jaccard
    * estimator needs (untagged copying would inflate agreement between
    * sparse documents). Token-less input → null, as [[sigTokensSha]]. */
  def sigTokensShaOph(tokens: ArrayData): ArrayData = {
    val toks = nonNullTokens(tokens)
    val n = toks.length
    if (n == 0) return null
    val md = shaDigest.get()
    val mins = new Array[Array[Byte]](OphBins)
    def fold(feed: MessageDigest => Unit): Unit = {
      md.reset()
      feed(md)
      val d = md.digest()
      val bin = (d(0) >>> 4) & 0xF
      if (mins(bin) == null || lessThan(d, mins(bin))) mins(bin) = d
    }
    if (n == 1) {
      val tb = toks(0).getBytes
      fold(_.update(tb))
    } else {
      val tb = new Array[Array[Byte]](n)
      var j = 0
      while (j < n) { tb(j) = toks(j).getBytes; j += 1 }
      j = 0
      while (j < n - 1) {
        val a = tb(j)
        val b = tb(j + 1)
        fold { m => m.update(a); m.update(' '.toByte); m.update(b) }
        j += 1
      }
    }
    val out = new Array[AnyRef](OphBins)
    var i = 0
    while (i < OphBins) {
      if (mins(i) != null) out(i) = toHex(mins(i))
      else {
        var j = 1
        while (mins((i + j) % OphBins) == null) j += 1
        out(i) = UTF8String.fromString(
          toHex(mins((i + j) % OphBins)).toString + ":" + j)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One-permutation MinHash over token 2-shingles, xxhash64 family — the
    * production path: one 64-bit hash per shingle, top-nibble bins,
    * UNSIGNED minima (mirroring the sha family's lexicographic byte
    * order), rotation densification re-keyed by distance —
    * `XXH64.hashLong(borrowed, j)`, deterministic in (value, distance),
    * so the collision structure matches the sha family's tagged borrow. */
  def sigTokensXxOph(tokens: ArrayData): ArrayData = {
    val toks = nonNullTokens(tokens)
    val n = toks.length
    if (n == 0) return null
    val mins = new Array[Long](OphBins)
    val filled = new Array[Boolean](OphBins)
    def fold(h: Long): Unit = {
      val bin = ((h >>> 60) & 0xFL).toInt
      if (!filled(bin) || java.lang.Long.compareUnsigned(h, mins(bin)) < 0) {
        mins(bin) = h
        filled(bin) = true
      }
    }
    if (n == 1) fold(XXH64.hashUTF8String(toks(0), 42L))
    else {
      var prev = XXH64.hashUTF8String(toks(0), 42L)
      var j = 1
      while (j < n) {
        val cur = XXH64.hashUTF8String(toks(j), 42L)
        fold(XXH64.hashLong(cur, prev))
        prev = cur
        j += 1
      }
    }
    val out = new Array[Long](OphBins)
    var i = 0
    while (i < OphBins) {
      if (filled(i)) out(i) = mins(i)
      else {
        var j = 1
        while (!filled((i + j) % OphBins)) j += 1
        out(i) = XXH64.hashLong(mins((i + j) % OphBins), j.toLong)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  // --------------------------------------------------------- b-bit MinHash

  /** b must divide 64 (lanes never straddle words) and be a whole number
    * of hex chars (so the sha-family lane parses from digest chars).
    * b-bit minhash (Li & König 2010) keeps only the low b bits per lane:
    * signature storage — and therefore every downstream shuffle byte —
    * shrinks 64/b ×, at the cost of a 2^-b accidental-collision rate the
    * estimator corrects for. */
  private[graft] def requireB(b: Int): Unit =
    require(b == 4 || b == 8 || b == 16 || b == 32,
      s"b-bit minhash requires b in {4, 8, 16, 32}, got $b")

  private def requirePackable(k: Int, b: Int): Unit = {
    val lanesPerWord = 64 / b
    require(k % lanesPerWord == 0,
      s"b-bit packing needs numHashes ($k) divisible by ${lanesPerWord} (= 64/b) lanes per word")
  }

  /** Pack the low b bits of each xxhash64-family lane, lane i at bits
    * [(i mod 64/b)·b, …) of word i/(64/b). */
  def bbitPackXx(sig: ArrayData, b: Int): ArrayData = {
    val k = sig.numElements()
    requirePackable(k, b)
    val lanesPerWord = 64 / b
    val mask = if (b == 64) -1L else (1L << b) - 1L
    val words = new Array[Long](k / lanesPerWord)
    var i = 0
    while (i < k) {
      val v = sig.getLong(i) & mask
      words(i / lanesPerWord) |= v << ((i % lanesPerWord) * b)
      i += 1
    }
    new GenericArrayData(words)
  }

  /** Pack the low b bits of each sha256-family lane — the low b bits of
    * the 256-bit digest, i.e. the integer value of the LAST b/4 hex
    * chars (what `strpos`-arithmetic re-derives in the DuckDB oracle). */
  def bbitPackSha(sig: ArrayData, b: Int): ArrayData = {
    val k = sig.numElements()
    requirePackable(k, b)
    val lanesPerWord = 64 / b
    val words = new Array[Long](k / lanesPerWord)
    var i = 0
    while (i < k) {
      val h = sig.getUTF8String(i)
      val nb = h.numBytes
      var v = 0L
      var j = nb - b / 4
      while (j < nb) {
        val c = h.getByte(j)
        val d = if (c >= '0' && c <= '9') c - '0' else c - 'a' + 10
        v = (v << 4) | d.toLong
        j += 1
      }
      words(i / lanesPerWord) |= v << ((i % lanesPerWord) * b)
      i += 1
    }
    new GenericArrayData(words)
  }

  /** Count of agreeing b-bit lanes between two packed signatures. */
  def bbitMatchCount(pa: ArrayData, pb: ArrayData, b: Int): Int = {
    val n = pa.numElements()
    require(n == pb.numElements(),
      s"packed signatures differ in length: $n vs ${pb.numElements()}")
    val lanesPerWord = 64 / b
    val mask = if (b == 64) -1L else (1L << b) - 1L
    var cnt = 0
    var w = 0
    while (w < n) {
      val x = pa.getLong(w) ^ pb.getLong(w)
      var l = 0
      while (l < lanesPerWord) {
        if (((x >>> (l * b)) & mask) == 0L) cnt += 1
        l += 1
      }
      w += 1
    }
    cnt
  }

  /** Li-König unbiased Jaccard estimate from packed b-bit signatures:
    * (f − c) / (1 − c) with f = matching-lane fraction and c = 2^-b the
    * accidental-collision rate. Pinned IEEE order: f = matches/k first,
    * then the corrected ratio — the oracle replays the identical ops.
    * NOT clamped: small-sample estimates below c come out negative by
    * design (thresholding is the caller's decision). */
  def bbitJaccardEst(pa: ArrayData, pb: ArrayData, b: Int): Double = {
    val k = pa.numElements() * (64 / b)
    val f = bbitMatchCount(pa, pb, b).toDouble / k.toDouble
    val c = 1.0 / (1L << b).toDouble
    (f - c) / (1.0 - c)
  }
}

/** Base for the fused MinHash signature expressions: unary, deterministic,
  * null-intolerant, single static kernel call inside whole-stage codegen. */
abstract class MinHashSigExpression extends UnaryExpression with Serializable {
  def family: String
  def numHashes: Int
  require(family == "xxhash64" || family == "sha256",
    s"unknown minhash family: $family")
  MinHashKernels.requireLanes(numHashes)
  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    if (family == "sha256") ArrayType(StringType, containsNull = false)
    else ArrayType(LongType, containsNull = false)
}

/** minhash_sig(tokens array<string>, k, family) → array of k lane minima
  * over token 2-shingles. Null elements are skipped; a token-less input
  * (empty array or all-null elements) yields NULL — not a shared sentinel
  * signature that would band-collide every empty document (see
  * [[MinHashKernels.nonNullTokens]]) — so the expression is nullable even
  * over a non-null child. */
case class MinHashSig(child: Expression, numHashes: Int, family: String)
    extends MinHashSigExpression {
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }
  private val kernelMethod =
    if (family == "sha256") "sigTokensSha" else "sigTokensXx"
  override protected def nullSafeEval(v: Any): Any =
    if (family == "sha256") MinHashKernels.sigTokensSha(v.asInstanceOf[ArrayData], numHashes)
    else MinHashKernels.sigTokensXx(v.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.MinHashKernels.$kernelMethod($v, $numHashes);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** minhash_sig_chars(s string, shingleK, k, family) → array of k lane
  * minima over code-point k-gram shingles (whole string when shorter). */
case class MinHashSigChars(child: Expression, shingleK: Int, numHashes: Int,
    family: String) extends MinHashSigExpression {
  require(shingleK > 0)
  override def prettyName: String = "minhash_sig_chars"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }
  private val kernelMethod =
    if (family == "sha256") "sigCharsSha" else "sigCharsXx"
  override protected def nullSafeEval(v: Any): Any =
    if (family == "sha256")
      MinHashKernels.sigCharsSha(v.asInstanceOf[UTF8String], shingleK, numHashes)
    else MinHashKernels.sigCharsXx(v.asInstanceOf[UTF8String], shingleK, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.MinHashKernels.$kernelMethod($v, $shingleK, $numHashes)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** minhash_sig_oph(tokens array<string>, family) → 16-bin one-permutation
  * MinHash signature with rotation densification
  * ([[MinHashKernels.sigTokensShaOph]] /
  * [[MinHashKernels.sigTokensXxOph]]): O(m) per document vs O(k·m) for
  * [[MinHashSig]] — the scale path for long documents, where the classic
  * signature's k lane hashes per shingle dominate the fingerprint pass.
  * Same null semantics as [[MinHashSig]] (token-less → NULL, never a
  * shared sentinel signature). */
case class MinHashSigOph(child: Expression, family: String)
    extends UnaryExpression with Serializable {
  require(family == "xxhash64" || family == "sha256",
    s"unknown minhash family: $family")
  override def prettyName: String = "minhash_sig_oph"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    if (family == "sha256") ArrayType(StringType, containsNull = false)
    else ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }
  private val kernelMethod =
    if (family == "sha256") "sigTokensShaOph" else "sigTokensXxOph"
  override protected def nullSafeEval(v: Any): Any =
    if (family == "sha256")
      MinHashKernels.sigTokensShaOph(v.asInstanceOf[ArrayData])
    else MinHashKernels.sigTokensXxOph(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.MinHashKernels.$kernelMethod($v);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** b-bit MinHash packing ([[MinHashKernels.bbitPackXx]] /
  * [[MinHashKernels.bbitPackSha]], Li & König 2010): keep only the low b
  * bits of every lane, packed 64/b lanes per long — shrinking the
  * signature (and every shuffle that moves it) 64/b ×. Accepts either
  * hash family by input type: array<long> (xxhash64 lanes) or
  * array<string> (sha256 hex lanes — low b bits of the digest). Null
  * signature (token-less document) stays null. */
case class BBitSig(child: Expression, b: Int)
    extends UnaryExpression with Serializable {
  MinHashKernels.requireB(b)
  override def prettyName: String = "bbit_sig"
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long> or array<string> (a minhash signature), got ${t.catalogString}")
  }
  // lazy: child.dataType is only legal after analysis resolves the child
  private lazy val kernelMethod = child.dataType match {
    case ArrayType(StringType, _) => "bbitPackSha"
    case _ => "bbitPackXx"
  }
  override protected def nullSafeEval(v: Any): Any =
    if (kernelMethod == "bbitPackSha")
      MinHashKernels.bbitPackSha(v.asInstanceOf[ArrayData], b)
    else MinHashKernels.bbitPackXx(v.asInstanceOf[ArrayData], b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.MinHashKernels.$kernelMethod($v, $b)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Shared base for the packed-b-bit-signature comparators. */
abstract class BBitCompareExpression
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with Serializable {
  def b: Int
  MinHashKernels.requireB(b)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<long> packed signatures, got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
}

/** Count of agreeing b-bit lanes between two packed signatures. */
case class BBitMatchCount(left: Expression, right: Expression, b: Int)
    extends BBitCompareExpression {
  override def prettyName: String = "bbit_match_count"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override protected def nullSafeEval(x: Any, y: Any): Any =
    MinHashKernels.bbitMatchCount(
      x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData], b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.MinHashKernels.bbitMatchCount($x, $y, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Li-König unbiased Jaccard estimate from packed b-bit signatures:
  * (f − 2^-b) / (1 − 2^-b); not clamped (see the kernel doc). */
case class BBitJaccardEst(left: Expression, right: Expression, b: Int)
    extends BBitCompareExpression {
  override def prettyName: String = "bbit_jaccard_est"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override protected def nullSafeEval(x: Any, y: Any): Any =
    MinHashKernels.bbitJaccardEst(
      x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData], b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.MinHashKernels.bbitJaccardEst($x, $y, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
