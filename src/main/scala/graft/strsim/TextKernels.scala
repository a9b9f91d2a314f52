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

  /** Trim set for line-level repetition stats: the [[isSpace]] class minus
    * '\n' (a line, being a '\n'-split fragment, cannot contain one) —
    * expressed in SQL as `trim(l, ' ' || chr(9) || chr(11) || chr(12) ||
    * chr(13))`, which is how the driver oracle reproduces it. */
  @inline private def isLineTrim(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\u000B' || c == '\f' || c == '\r'

  /** Repetition counters for Gopher-style quality filtering (Rae et al.
    * 2021, "Scaling Language Models", Table A1): the raw integer counters
    * behind duplicate-line fraction, duplicate-line character fraction,
    * and most-repeated-bigram character coverage. Returned as counters —
    * not fractions — so the caller derives each fraction with a SINGLE
    * division of two exact integers, which any ANSI engine reproduces
    * bit-for-bit (the DuckDB driver oracle does).
    *
    * Layout (all counts in code points, matching SQL `length()`):
    *   0  line instances            — nonempty lines after trimming
    *                                  [[isLineTrim]] from both ends
    *   1  duplicate line instances  — Σ over distinct lines of (count-1)
    *   2  duplicate line chars      — Σ (count-1)·len(line)
    *   3  total line chars          — Σ count·len(line)
    *   4  top bigram coverage       — max over adjacent word pairs of
    *                                  count·(len(w1)+len(w2)); 0 if <2 words
    *   5  total word chars          — Σ len(word) over all word instances
    *
    * Lines split on '\n'; words on the [[isSpace]] class. "Top bigram" is
    * defined as max COVERAGE (count × length), not the most frequent
    * bigram's coverage — the max needs no tie-break, so the result is
    * deterministic without pinning a cross-engine string sort order.
    * NOTE: coverage is the standard count×len product (as in DataTrove/
    * NeMo-Curator top-n-gram fractions), so OVERLAPPING occurrences of a
    * self-repeating bigram count their shared word twice — the derived
    * ratio can exceed 1.0 on degenerate repetition ("xx xx xx xx" →
    * 12/8 = 1.5). That is deliberate: >1 is a strictly-stronger
    * repetition signal, and any threshold in (0,1] classifies it
    * correctly; clamping would lose the distinction.
    * One pass, per-row hash maps; O(doc length), zero shuffle. */
  def repetitionCounters(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = text.toString
    val n = s.length
    val out = new Array[Long](6)
    // --- lines ---
    val lineCounts = new java.util.HashMap[String, Array[Long]]()
    var i = 0
    while (i <= n) {
      var j = i
      while (j < n && s.charAt(j) != '\n') j += 1
      var a = i
      var b = j
      while (a < b && isLineTrim(s.charAt(a))) a += 1
      while (b > a && isLineTrim(s.charAt(b - 1))) b -= 1
      if (b > a) {
        val line = s.substring(a, b)
        val e = lineCounts.computeIfAbsent(line,
          l => Array(0L, l.codePointCount(0, l.length).toLong))
        e(0) += 1
      }
      i = j + 1
    }
    lineCounts.forEach { (_, e) =>
      val c = e(0); val ln = e(1)
      out(0) += c
      out(1) += c - 1
      out(2) += (c - 1) * ln
      out(3) += c * ln
    }
    // --- words / bigrams ---
    val bigramCounts = new java.util.HashMap[String, Array[Long]]()
    var prev: String = null
    i = 0
    while (i < n) {
      while (i < n && (s.charAt(i) == '\n' || isLineTrim(s.charAt(i)))) i += 1
      val start = i
      while (i < n && s.charAt(i) != '\n' && !isLineTrim(s.charAt(i))) i += 1
      if (i > start) {
        val w = s.substring(start, i)
        out(5) += w.codePointCount(0, w.length)
        if (prev != null) {
          val key = prev + "\u0001" + w
          val e = bigramCounts.computeIfAbsent(key,
            k => Array(0L, (k.codePointCount(0, k.length) - 1).toLong))
          e(0) += 1
        }
        prev = w
      }
    }
    bigramCounts.forEach { (_, e) =>
      val cover = e(0) * e(1)
      if (cover > out(4)) out(4) = cover
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
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

  // ---------------------------------------------------------------- NYSIIS

  private def isVowel(c: Char): Boolean =
    c == 'A' || c == 'E' || c == 'I' || c == 'O' || c == 'U'

  /** NYSIIS phonetic key (Taft 1970, the New York State Identification and
    * Intelligence System code) — the second classic phonetic blocking key
    * next to [[graft.operators.Phonetic.soundexKey]]: better suited to
    * vowel-heavy and non-Anglo surnames because it keeps a full consonant
    * skeleton instead of Soundex's 3-digit truncation.
    *
    * PINNED variant (documented here because published NYSIIS
    * implementations disagree on the H/W and multi-char interior rules;
    * the DuckDB oracle replays EXACTLY these steps):
    *
    *  1. uppercase, strip everything outside A-Z; empty → "".
    *  2. prefix: MAC→MCC, KN→NN, K→C, PH→FF, PF→FF, SCH→SSS.
    *  3. suffix: EE/IE→Y; DT/RT/RD/NT/ND→D.
    *  4. key = first char; for each later position with (prev, cur, next)
    *     read from the step-2/3 string (NOT the key built so far), the
    *     first matching rule wins:
    *       S[CH]→S, [S]C[H]→S, [SC]H→S   (SCH→SSS anywhere)
    *       P[H]→F, [P]H→F                (PH→FF)
    *       [E]V→F; vowels→A; Q→G; Z→S; M→N
    *       K→ skip if next is N, else C  (the N itself survives)
    *       H→ keep only between two vowels, else skip
    *       W→ skip after a vowel, else W
    *       otherwise → itself
    *     append iff ≠ the last appended char (collapse runs).
    *  5. drop trailing S (if longer than 1), AY→Y, drop trailing A (if
    *     longer than 1); truncate to 6 (the classic key width).
    */
  def nysiis(s: UTF8String): UTF8String = {
    val raw = s.toString
    val up = new StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = Character.toUpperCase(raw.charAt(i))
      if (c >= 'A' && c <= 'Z') up.append(c)
      i += 1
    }
    if (up.isEmpty) return UTF8String.EMPTY_UTF8
    var nm = up.toString
    // step 2: prefix
    if (nm.startsWith("MAC")) nm = "MCC" + nm.substring(3)
    else if (nm.startsWith("KN")) nm = "NN" + nm.substring(2)
    else if (nm.startsWith("K")) nm = "C" + nm.substring(1)
    else if (nm.startsWith("PH") || nm.startsWith("PF")) nm = "FF" + nm.substring(2)
    else if (nm.startsWith("SCH")) nm = "SSS" + nm.substring(3)
    // step 3: suffix
    if (nm.endsWith("EE") || nm.endsWith("IE"))
      nm = nm.substring(0, nm.length - 2) + "Y"
    else if (nm.endsWith("DT") || nm.endsWith("RT") || nm.endsWith("RD") ||
        nm.endsWith("NT") || nm.endsWith("ND"))
      nm = nm.substring(0, nm.length - 2) + "D"
    // step 4: transcode against the FIXED post-prefix/suffix string
    val key = new StringBuilder(nm.length)
    key.append(nm.charAt(0))
    i = 1
    while (i < nm.length) {
      val cur = nm.charAt(i)
      val prev = nm.charAt(i - 1)
      val prev2 = if (i >= 2) nm.charAt(i - 2) else ' '
      val next = if (i + 1 < nm.length) nm.charAt(i + 1) else ' '
      val next2 = if (i + 2 < nm.length) nm.charAt(i + 2) else ' '
      // ' ' = skip (emit nothing)
      val tc: Char =
        if (cur == 'S' && next == 'C' && next2 == 'H') 'S'
        else if (cur == 'C' && prev == 'S' && next == 'H') 'S'
        else if (cur == 'H' && prev == 'C' && prev2 == 'S') 'S'
        else if (cur == 'P' && next == 'H') 'F'
        else if (cur == 'H' && prev == 'P') 'F'
        else if (cur == 'V' && prev == 'E') 'F'
        else if (isVowel(cur)) 'A'
        else if (cur == 'Q') 'G'
        else if (cur == 'Z') 'S'
        else if (cur == 'M') 'N'
        else if (cur == 'K') { if (next == 'N') ' ' else 'C' }
        else if (cur == 'H') { if (isVowel(prev) && isVowel(next)) 'H' else ' ' }
        else if (cur == 'W') { if (isVowel(prev)) ' ' else 'W' }
        else cur
      if (tc != ' ' && tc != key.charAt(key.length - 1)) key.append(tc)
      i += 1
    }
    // step 5: suffix cleanup + classic 6-char truncation
    var k = key.toString
    if (k.length > 1 && k.endsWith("S")) k = k.substring(0, k.length - 1)
    if (k.endsWith("AY")) k = k.substring(0, k.length - 2) + "Y"
    if (k.length > 1 && k.endsWith("A")) k = k.substring(0, k.length - 1)
    if (k.length > 6) k = k.substring(0, 6)
    UTF8String.fromString(k)
  }

  def nysiis(s: String): String = nysiis(UTF8String.fromString(s)).toString

  /** Cologne phonetics (Kölner Phonetik, Postel 1969) — the third phonetic
    * blocking key next to Soundex and NYSIIS, tuned for German names and
    * variable-length (no truncation), so it separates long names Soundex's
    * 4-char key folds together.
    *
    * PINNED variant (the DuckDB oracle replays EXACTLY these steps):
    *
    *  1. uppercase per char; map Ä→A Ö→O Ü→U ß→S; strip non-A-Z; empty→"".
    *  2. per-letter code with context read from the STRIPPED string:
    *     vowels/J/Y→0; H→(no code); B→1; P→1 but 3 before H; D,T→2 but 8
    *     before C/S/Z; F,V,W→3; G,K,Q→4; L→5; M,N→6; R→7; S,Z→8;
    *     C→4 when (initial and before A,H,K,L,O,Q,R,U,X) or (non-initial,
    *     not after S/Z, and before A,H,K,O,Q,U,X), else 8;
    *     X→8 after C,K,Q else the TWO codes 48.
    *  3. collapse adjacent equal digits in the emitted code string (X's
    *     48 participates as two codes; codes collapse ACROSS skipped H —
    *     both standard emit-then-collapse semantics).
    *  4. drop every 0 except a leading one.
    *
    * Checked against the published worked examples:
    * Müller-Lüdenscheidt→65752682, Breschnew→17863, Wikipedia→3412. */
  def cologne(s: UTF8String): UTF8String = {
    val raw = s.toString
    val up = new StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val u = Character.toUpperCase(raw.charAt(i))
      val c = u match {
        case 'Ä' => 'A'; case 'Ö' => 'O'; case 'Ü' => 'U'; case 'ß' => 'S'
        case x => x
      }
      if (c >= 'A' && c <= 'Z') up.append(c)
      i += 1
    }
    if (up.isEmpty) return UTF8String.EMPTY_UTF8
    val nm = up.toString
    val codes = new StringBuilder(nm.length + 2)
    i = 0
    while (i < nm.length) {
      val cur = nm.charAt(i)
      val prev = if (i > 0) nm.charAt(i - 1) else ' '
      val next = if (i + 1 < nm.length) nm.charAt(i + 1) else ' '
      cur match {
        case 'A' | 'E' | 'I' | 'J' | 'O' | 'U' | 'Y' => codes.append('0')
        case 'H' => // silent: no code
        case 'B' => codes.append('1')
        case 'P' => codes.append(if (next == 'H') '3' else '1')
        case 'D' | 'T' =>
          codes.append(if (next == 'C' || next == 'S' || next == 'Z') '8' else '2')
        case 'F' | 'V' | 'W' => codes.append('3')
        case 'G' | 'K' | 'Q' => codes.append('4')
        case 'C' =>
          val soft =
            if (i == 0) "AHKLOQRUX".indexOf(next) >= 0
            else prev != 'S' && prev != 'Z' && "AHKOQUX".indexOf(next) >= 0
          codes.append(if (soft) '4' else '8')
        case 'X' =>
          if (prev == 'C' || prev == 'K' || prev == 'Q') codes.append('8')
          else { codes.append('4'); codes.append('8') }
        case 'L' => codes.append('5')
        case 'M' | 'N' => codes.append('6')
        case 'R' => codes.append('7')
        case 'S' | 'Z' => codes.append('8')
        case _ => // unreachable: stripped to A-Z
      }
      i += 1
    }
    // collapse runs, then strip non-leading 0s
    val out = new StringBuilder(codes.length)
    i = 0
    while (i < codes.length) {
      val c = codes.charAt(i)
      if (i == 0) out.append(c)
      else if (c != codes.charAt(i - 1) && (c != '0')) out.append(c)
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  def cologne(s: String): String = cologne(UTF8String.fromString(s)).toString

  /** Match Rating Approach codex (Moore et al. 1977, Western Airlines) —
    * the fourth phonetic key, paired with its OWN comparison rule
    * ([[mraSimilarity]]/[[mraMatch]]) rather than plain key equality.
    *
    * PINNED codex: uppercase, strip non-A-Z (empty → ""); drop vowels
    * AEIOU except a leading one; collapse adjacent duplicate letters; if
    * longer than 6, keep first 3 + last 3. */
  def mraCodex(s: UTF8String): UTF8String = {
    val raw = s.toString
    val up = new StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = Character.toUpperCase(raw.charAt(i))
      if (c >= 'A' && c <= 'Z') up.append(c)
      i += 1
    }
    if (up.isEmpty) return UTF8String.EMPTY_UTF8
    val kept = new StringBuilder(up.length)
    kept.append(up.charAt(0))
    i = 1
    while (i < up.length) {
      val c = up.charAt(i)
      if ("AEIOU".indexOf(c) < 0) kept.append(c)
      i += 1
    }
    val coll = new StringBuilder(kept.length)
    i = 0
    while (i < kept.length) {
      val c = kept.charAt(i)
      if (i == 0 || c != kept.charAt(i - 1)) coll.append(c)
      i += 1
    }
    var k = coll.toString
    if (k.length > 6) k = k.substring(0, 3) + k.substring(k.length - 3)
    UTF8String.fromString(k)
  }

  /** MRA comparison rating in 0..6, or -1 = "no comparison" (codex length
    * difference >= 3 — the published gate). PINNED variant (published MRA
    * descriptions differ on the unmatched-character scan; this is the
    * POSITIONAL-ZIP reading, fully relational for the oracle): forward
    * residuals keep each codex's chars that differ from the other codex
    * at the SAME position (or extend past it); the backward pass repeats
    * positionally on the reversed residuals; rating = 6 − the longer
    * backward residual. */
  def mraSimilarity(a: UTF8String, b: UTF8String): Int = {
    val c1 = mraCodex(a).toString
    val c2 = mraCodex(b).toString
    if (math.abs(c1.length - c2.length) >= 3) return -1
    def residual(x: String, y: String): String = {
      val sb = new StringBuilder(x.length)
      var i = 0
      while (i < x.length) {
        if (i >= y.length || x.charAt(i) != y.charAt(i)) sb.append(x.charAt(i))
        i += 1
      }
      sb.toString
    }
    val r1 = residual(c1, c2)
    val r2 = residual(c2, c1)
    val b1 = r1.reverse
    val b2 = r2.reverse
    val u = math.max(residual(b1, b2).length, residual(b2, b1).length)
    6 - u
  }

  /** MRA decision: 1 = codexes match (rating >= the minimum for their
    * combined length: <=4 → 5, <=7 → 4, <=11 → 3, else 2), 0 = no, -1 =
    * "no comparison" (see [[mraSimilarity]]). */
  def mraMatch(a: UTF8String, b: UTF8String): Int = {
    val sim = mraSimilarity(a, b)
    if (sim < 0) return -1
    val len = mraCodex(a).numChars + mraCodex(b).numChars
    val minRating =
      if (len <= 4) 5 else if (len <= 7) 4 else if (len <= 11) 3 else 2
    if (sim >= minRating) 1 else 0
  }

  def mraCodex(s: String): String = mraCodex(UTF8String.fromString(s)).toString
  def mraSimilarity(a: String, b: String): Int =
    mraSimilarity(UTF8String.fromString(a), UTF8String.fromString(b))
  def mraMatch(a: String, b: String): Int =
    mraMatch(UTF8String.fromString(a), UTF8String.fromString(b))

  private def isMetaVowel(c: Char): Boolean =
    c == 'A' || c == 'E' || c == 'I' || c == 'O' || c == 'U'

  /** Original Metaphone key (Philips 1990) — fifth phonetic family,
    * consonant-class folding richer than Soundex's digit map (CH/SH→X,
    * TH→0, DGE→J, silent GH/KN/WR/MB...).
    *
    * PINNED variant (published implementations disagree on many edge
    * rules; the oracle replays EXACTLY these, and every position's
    * emission depends only on (prev, cur, next, next2, first?, last?) —
    * deliberately POSITIONAL so the oracle needs no recursion):
    *
    *  1. uppercase, strip non-A-Z; empty → "".
    *  2. initial transforms: AE/GN/KN/PN/WR → drop the first letter;
    *     X… → S…; WH… → W… .
    *  3. per position, first matching rule wins (· = emit nothing):
    *     duplicate of prev (except C) → ·; vowels → kept only at
    *     position 1; B → · when final after M; C → X before IA or H
    *     (but SCH → K), S before E/I/Y (· after S), else K; D → J
    *     before GE/GI/GY else T; G → before H: K when a vowel follows
    *     the H else ·; · before N; · in DGE/DGI/DGY (the D said J);
    *     J before E/I/Y; else K; H → · after C/S/P/T/G, · after a
    *     vowel with no vowel following, else H; K → · after C;
    *     P → F before H; Q → K; S → X before H or IO/IA; T → · in
    *     TCH, 0 before H, X before IO/IA; V → F; W/Y → kept only
    *     before a vowel; X → KS; Z → S; F/J/L/M/N/R → themselves.
    *  4. no truncation (classic 4-char cut discards signal at linkage
    *     scale; callers can substr).
    *
    * Hand-derived conformance examples (from these rules):
    * metaphone→MTFN, Knight→NT, Wright→RT, school→SKL, science→SNS,
    * lamb→LM, judge→JJ, watch→WX, ghost→KST. */
  def metaphone(s: UTF8String): UTF8String = {
    val raw = s.toString
    val up0 = new StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = Character.toUpperCase(raw.charAt(i))
      if (c >= 'A' && c <= 'Z') up0.append(c)
      i += 1
    }
    if (up0.isEmpty) return UTF8String.EMPTY_UTF8
    var nm = up0.toString
    val first2 = if (nm.length >= 2) nm.substring(0, 2) else ""
    if (first2 == "AE" || first2 == "GN" || first2 == "KN" ||
        first2 == "PN" || first2 == "WR") nm = nm.substring(1)
    else if (nm.charAt(0) == 'X') nm = "S" + nm.substring(1)
    else if (first2 == "WH") nm = "W" + nm.substring(2)
    val n = nm.length
    val out = new StringBuilder(n + 2)
    i = 0
    while (i < n) {
      val cur = nm.charAt(i)
      val prv = if (i > 0) nm.charAt(i - 1) else 0.toChar
      val nxt = if (i + 1 < n) nm.charAt(i + 1) else 0.toChar
      val nx2 = if (i + 2 < n) nm.charAt(i + 2) else 0.toChar
      def eiy(c: Char) = c == 'E' || c == 'I' || c == 'Y'
      if (cur == prv && cur != 'C') { /* dedup */ }
      else cur match {
        case 'A' | 'E' | 'I' | 'O' | 'U' => if (i == 0) out.append(cur)
        case 'B' => if (!(i == n - 1 && prv == 'M')) out.append('B')
        case 'C' =>
          if (nxt == 'I' && nx2 == 'A') out.append('X')
          else if (nxt == 'H') out.append(if (prv == 'S') 'K' else 'X')
          else if (eiy(nxt)) { if (prv != 'S') out.append('S') }
          else out.append('K')
        case 'D' =>
          out.append(if (nxt == 'G' && eiy(nx2)) 'J' else 'T')
        case 'G' =>
          if (nxt == 'H') { if (isMetaVowel(nx2)) out.append('K') }
          else if (nxt == 'N') { /* silent */ }
          else if (prv == 'D' && eiy(nxt)) { /* DGE: D already said J */ }
          else if (eiy(nxt)) out.append('J')
          else out.append('K')
        case 'H' =>
          val afterSilencer = prv == 'C' || prv == 'S' || prv == 'P' ||
            prv == 'T' || prv == 'G'
          if (!afterSilencer && !(isMetaVowel(prv) && !isMetaVowel(nxt)))
            out.append('H')
        case 'K' => if (prv != 'C') out.append('K')
        case 'P' => out.append(if (nxt == 'H') 'F' else 'P')
        case 'Q' => out.append('K')
        case 'S' =>
          if (nxt == 'H' || (nxt == 'I' && (nx2 == 'O' || nx2 == 'A')))
            out.append('X')
          else out.append('S')
        case 'T' =>
          if (nxt == 'C' && nx2 == 'H') { /* TCH: the C says X */ }
          else if (nxt == 'H') out.append('0')
          else if (nxt == 'I' && (nx2 == 'O' || nx2 == 'A')) out.append('X')
          else out.append('T')
        case 'V' => out.append('F')
        case 'W' => if (isMetaVowel(nxt)) out.append('W')
        case 'X' => out.append('K'); out.append('S')
        case 'Y' => if (isMetaVowel(nxt)) out.append('Y')
        case 'Z' => out.append('S')
        case other => out.append(other) // F J L M N R
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  def metaphone(s: String): String = metaphone(UTF8String.fromString(s)).toString

  // ------------------------------------------------ Unicode normalization

  /** Unicode-normalize to `form` (java.text.Normalizer) — the
    * canonicalization step in front of any byte-comparing stage: two
    * visually identical names with different code-point sequences
    * (é vs e+◌́) must produce the SAME block keys, signatures, and
    * similarity scores, and every downstream kernel compares raw code
    * points. Fast path: the isNormalized probe skips the rebuild for
    * already-normal input (all-ASCII always is), so the common web-corpus
    * row costs one linear scan. */
  def unicodeNorm(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }

  /** Accent strip: NFD-decompose, drop combining marks (general categories
    * Mn/Mc/Me, code-point iteration so supplementary-plane marks strip
    * too), NFC-recompose. Matches DuckDB's ICU `strip_accents` across the
    * Latin palette (spec-pinned); characters with no canonical
    * decomposition (ł ø ß æ) are KEPT — accent stripping is not
    * transliteration. Pinned fast path: input whose NFD form contains no
    * marks returns the ORIGINAL bytes unchanged (no recomposition pass —
    * mark-free singleton decompositions like U+2126 Ω or composable
    * Hangul jamo are left as-is; compose them explicitly with
    * `unicode_norm(c, "NFC")` first if that matters). */
  def stripAccents(s: UTF8String): UTF8String = {
    val nfd = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
    @inline def isMark(cp: Int): Boolean = {
      val t = Character.getType(cp)
      t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
        t == Character.ENCLOSING_MARK
    }
    var i = 0
    var hasMark = false
    while (i < nfd.length && !hasMark) {
      val cp = nfd.codePointAt(i)
      hasMark = isMark(cp)
      i += Character.charCount(cp)
    }
    if (!hasMark) return s
    val sb = new java.lang.StringBuilder(nfd.length)
    i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (!isMark(cp)) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(java.text.Normalizer.normalize(
      sb.toString, java.text.Normalizer.Form.NFC))
  }

  def unicodeNorm(s: String, form: String): String =
    unicodeNorm(UTF8String.fromString(s),
      java.text.Normalizer.Form.valueOf(form)).toString
  def stripAccents(s: String): String =
    stripAccents(UTF8String.fromString(s)).toString

  /** N-gram fingerprint core (OpenRefine's ngram-fingerprint keyer, the
    * clustering method practitioners reach for first): the DISTINCT
    * code-point n-grams of `s`, sorted in BINARY (UTF-8 byte) order —
    * the same order DuckDB/ICU binary collation sorts strings, so the
    * oracle replays the sort exactly — concatenated. Caller normalizes
    * first ([[graft.functions.normalize_match]]) and strips spaces; this
    * kernel only shingles/dedups/sorts/joins. Strings shorter than n
    * code points fingerprint to themselves (one whole-string gram). */
  def ngramFingerprint(s: UTF8String, n: Int): UTF8String = {
    require(n >= 1 && n <= 8, s"ngram fingerprint requires n in 1..8, got $n")
    val nc = s.numChars()
    if (nc <= n) return s
    val grams = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i + n <= nc) {
      grams.add(s.substring(i, i + n))
      i += 1
    }
    val it = grams.iterator()
    val sb = new java.lang.StringBuilder(grams.size * n)
    while (it.hasNext) sb.append(it.next().toString)
    UTF8String.fromString(sb.toString)
  }

  def ngramFingerprint(s: String, n: Int): String =
    ngramFingerprint(UTF8String.fromString(s), n).toString
}
