package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Phonetic blocking keys for record linkage.
  *
  * Hash blocking on exact normalized keys misses spelling variants that
  * SOUND alike ("Robert"/"Rupert", "Ashcraft"/"Ashcroft"); a phonetic key
  * buckets them together, at the cost of coarser buckets. Classic third
  * leg of the blocking stool next to equi-key ([[Linkage.candidateKeys]])
  * and sorted-neighborhood ([[Linkage.sortedNeighborhoodPairs]]) blocking.
  *
  * The key is built as a chain of codegen BUILT-INS (upper / regexp_replace
  * / translate / rpad — the Java∩RE2 regex dialect shared with the DuckDB
  * oracle, no backreferences), so it stays inside whole-stage codegen with
  * zero shuffle and the oracle can replay the identical chain.
  */
object Phonetic {

  /** Letter → Soundex digit map: A0 B1 C2 D3 E0 F1 G2 H7 I0 J2 K2 L4 M5
    * N5 O0 P1 Q2 R6 S2 T3 U0 V1 W7 X2 Y0 Z2 — vowels/Y code 0 (separators),
    * H/W code 7 (a transparency marker removed before run-collapsing). */
  private val codeMap = "01230127022455012623017202"

  /** Classic American Soundex key (the H/W-transparent variant: NARA rules,
    * same test vectors as Wikipedia's worked examples — Pfister→P236,
    * Tymczak→T522, Honeyman→H555, Ashcraft→A261). Pinned semantics:
    *
    *  1. uppercase, strip everything outside A-Z; empty → `""`;
    *  2. map every letter to its digit (H/W → the marker 7);
    *  3. remove the 7s FIRST — so same-coded consonants separated only by
    *     H/W collapse in step 4 (the transparency rule);
    *  4. collapse runs of each digit 1-6 (vowel 0s separate runs, so
    *     repeats across a vowel survive);
    *  5. remove the 0s;
    *  6. if the first letter is a coded consonant (not A/E/I/O/U/Y/H/W),
    *     drop the leading digit — it encoded the first letter itself plus
    *     any same-code run absorbed into it;
    *  7. key = first letter + first 3 remaining digits, right-padded with
    *     '0' to 3.
    */
  def soundexKey(c: Column): Column = {
    val letters = regexp_replace(upper(c), "[^A-Z]", "")
    val coded = translate(letters, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", codeMap)
    val noHw = regexp_replace(coded, "7", "")
    val collapsed = (1 to 6).foldLeft(noHw) { (acc, d) =>
      regexp_replace(acc, s"$d{2,}", s"$d")
    }
    val digits = regexp_replace(collapsed, "0", "")
    val first = substring(letters, 1, 1)
    val tail = when(first.isin("A", "E", "I", "O", "U", "Y", "H", "W"), digits)
      .otherwise(substring(digits, 2, Int.MaxValue))
    when(letters === "", lit("")).otherwise(
      concat(first, rpad(substring(tail, 1, 3), 3, "0")))
  }

  /** Refined Soundex letter → digit map (the Commons-Codec /
    * "refined soundex" table): A0 B1 C3 D6 E0 F2 G4 H0 I0 J4 K3 L7 M8 N8
    * O0 P1 Q5 R9 S3 T6 U0 V2 W0 X5 Y0 Z5 — ten code classes instead of
    * classic Soundex's seven, vowels retained as 0 separators. */
  private val refinedCodeMap = "01360240043788015936020505"

  /** Refined Soundex key: finer-grained and longer than classic Soundex —
    * ten consonant classes, NO length cap, vowel 0s KEPT (so vowels
    * separate consonant runs but never merge across them), making it the
    * higher-precision/lower-recall member of the phonetic-key family
    * (classic Soundex buckets too coarsely for large corpora; refined
    * keys split those hot buckets). Pinned semantics (the widely
    * implemented variant, e.g. Apache Commons Codec `RefinedSoundex`):
    *
    *  1. uppercase, strip everything outside A-Z; empty → `""`;
    *  2. map EVERY letter (including the first) to its digit;
    *  3. collapse runs of each identical adjacent digit;
    *  4. key = first letter + the collapsed digit string (no pad, no cap).
    *
    * Worked example: TESTING → 6 0 3 6 0 8 4 → T6036084. */
  def refinedSoundexKey(c: Column): Column = {
    val letters = regexp_replace(upper(c), "[^A-Z]", "")
    val coded = translate(letters, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", refinedCodeMap)
    val collapsed = (0 to 9).foldLeft(coded) { (acc, d) =>
      regexp_replace(acc, s"$d{2,}", s"$d")
    }
    when(letters === "", lit("")).otherwise(
      concat(substring(letters, 1, 1), collapsed))
  }

  /** Caverphone 2.0 key (David Hood, "Caverphone Revisited", 2004 — the
    * accent-tolerant phonetic code developed for the Caversham Project's
    * New Zealand electoral-roll linkage; pinned vectors:
    * Stevenson → STFNSN1111, Peter → PTA1111111, "" → 1111111111).
    *
    * The published algorithm is literally a fixed sequence of string
    * rewrites, so the key is a chain of codegen regexp_replace built-ins
    * (Java∩RE2 dialect — anchors and character classes only, no
    * backreferences) the oracle replays verbatim with DuckDB's
    * regexp_replace(..., 'g'). Zero shuffle, stays inside whole-stage
    * codegen like [[soundexKey]]. */
  def caverphoneKey(c: Column): Column = {
    val letters = regexp_replace(lower(c), "[^a-z]", "")
    val coded = caverphoneRules.foldLeft(letters) { case (acc, (p, r)) =>
      regexp_replace(acc, p, r)
    }
    substring(concat(coded, lit("1111111111")), 1, 10)
  }

  /** (pattern, replacement) pairs in the EXACT published order; every
    * rewrite is global (Spark regexp_replace is global; the oracle adds
    * 'g'). Shared with the oracle builder so both engines replay ONE
    * rule table. */
  private[graft] val caverphoneRules: Seq[(String, String)] = Seq(
      "e$" -> "",
      "^cough" -> "cou2f", "^rough" -> "rou2f", "^tough" -> "tou2f",
      "^enough" -> "enou2f", "^trough" -> "trou2f", "^gn" -> "2n",
      "mb$" -> "m2",
      "cq" -> "2q", "ci" -> "si", "ce" -> "se", "cy" -> "sy",
      "tch" -> "2ch", "c" -> "k", "q" -> "k", "x" -> "k", "v" -> "f",
      "dg" -> "2g", "tio" -> "sio", "tia" -> "sia", "d" -> "t",
      "ph" -> "fh", "b" -> "p", "sh" -> "s2", "z" -> "s",
      "^[aeiou]" -> "A", "[aeiou]" -> "3",
      "j" -> "y", "^y3" -> "Y3", "^y" -> "A", "y" -> "3",
      "3gh3" -> "3kh3", "gh" -> "22", "g" -> "k",
      "s+" -> "S", "t+" -> "T", "p+" -> "P", "k+" -> "K", "f+" -> "F",
      "m+" -> "M", "n+" -> "N",
      "w3" -> "W3", "wh3" -> "Wh3", "w$" -> "3", "w" -> "2",
      "^h" -> "A", "h" -> "2",
      "r3" -> "R3", "r$" -> "3", "r" -> "2",
      "l3" -> "L3", "l$" -> "3", "l" -> "2",
      "2" -> "", "3$" -> "A", "3" -> "")
}
