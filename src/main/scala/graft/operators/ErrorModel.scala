package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic error injection — the Febrl data-generator move
  * (Christen & Pudjijono, "Accurate synthetic generation of realistic
  * personal information", PAKDD 2009): synthesize labeled duplicates by
  * corrupting real records with the edit-error families real data entry
  * produces (deletions, substitutions, adjacent transpositions,
  * insertions). Every ER evaluation gate in this repo needs labeled
  * pairs; this is the standard way to mint them at any scale with a
  * KNOWN truth — each emitted duplicate carries its origin id, so
  * (orig_id, dup_id) IS the positive label set, and the op column
  * stratifies recall by error family (a blocker that survives deletions
  * but not transpositions shows up immediately).
  *
  * Determinism is the [[Sampling.hashFraction]] family: every choice —
  * duplicate or not, which op, which position, which replacement char —
  * is a nibble range of ONE sha256(id:seed) digest, so the output is a
  * pure projection (zero shuffle, zero state), partition-independent,
  * and replayable by any engine with sha256 (the gate oracle re-derives
  * every choice from the hex digits). Adding records later never
  * changes existing duplicates; bumping `seed` re-rolls the whole set.
  *
  * Ops (selected by nibble 9 mod 4, position by nibbles 10-11 mod the
  * op's valid range, replacement char by nibbles 12-13 mod 26 over
  * a-z):
  *  - `delete`     — drop the character at pos (pos ∈ [1, len])
  *  - `substitute` — replace the character at pos with the palette char
  *  - `transpose`  — swap the characters at pos, pos+1 (pos ∈ [1, len−1])
  *  - `insert`     — insert the palette char before pos (pos ∈ [1, len+1])
  * Degenerate inputs degrade deterministically: an empty string always
  * takes `insert`; a 1-char string maps `transpose` to `substitute`. An
  * op may reproduce the original (substituting a char with itself,
  * transposing equal neighbors) — kept deliberately: real error models
  * include exact duplicates, and the label is still a true pair.
  *
  * Positions are 1-based CHARACTER offsets (both Spark's `substr` and
  * the oracle's count code points, so the contract holds beyond ASCII).
  *
  * Output: one row per corrupted record —
  * (orig_id, dup_id = orig_id || "_dup", textCol (original),
  * corrupted, op). Union `corrupted` back over the base table to build
  * the evaluation corpus; join on orig_id for the positive labels. */
object ErrorModel {

  private val Palette = "abcdefghijklmnopqrstuvwxyz"

  /** Nibble range [from, from+width) of hex column `h` as a long. */
  private def nib(h: Column, from: Int, width: Int): Column =
    conv(substring(h, from, width), 16, 10).cast("long")

  def corruptedDuplicates(records: DataFrame, idCol: String,
      textCol: String, dupRate: Double, seed: Long = 0L): DataFrame = {
    require(dupRate > 0.0 && dupRate <= 1.0,
      s"dupRate must be in (0,1], got $dupRate")
    require(records.columns.contains(idCol), s"no column $idCol")
    require(records.columns.contains(textCol), s"no column $textCol")
    val t = col(textCol)
    val h = sha2(concat(col(idCol).cast("string"), lit(s":$seed")), 256)
    val len = length(t)
    val opRaw = pmod(nib(h, 9, 1), lit(4L))
    // 0 = delete, 1 = substitute, 2 = transpose, 3 = insert — degraded
    // deterministically where the string is too short for the op
    val op = when(len === 0, lit(3L))
      .when(opRaw === 2L && len < 2, lit(1L))
      .otherwise(opRaw)
    val bound = when(op === 3L, len + 1)
      .when(op === 2L, len - 1)
      .otherwise(len)
    val pos = pmod(nib(h, 10, 2), bound.cast("long")) + 1L
    val pch = lit(Palette).substr(
      (pmod(nib(h, 12, 2), lit(26L)) + 1L).cast("int"), lit(1))
    val head = t.substr(lit(1), (pos - 1).cast("int"))
    val corrupted = when(op === 0L,
        concat(head, t.substr((pos + 1).cast("int"), len)))
      .when(op === 1L,
        concat(head, pch, t.substr((pos + 1).cast("int"), len)))
      .when(op === 2L,
        concat(head, t.substr((pos + 1).cast("int"), lit(1)),
          t.substr(pos.cast("int"), lit(1)),
          t.substr((pos + 2).cast("int"), len)))
      .otherwise(concat(head, pch, t.substr(pos.cast("int"), len)))
    records
      .where(Sampling.hashFraction(col(idCol), seed) < dupRate)
      .select(col(idCol).as("orig_id"),
        concat(col(idCol).cast("string"), lit("_dup")).as("dup_id"),
        t.as(textCol),
        corrupted.as("corrupted"),
        when(op === 0L, "delete").when(op === 1L, "substitute")
          .when(op === 2L, "transpose").otherwise("insert").as("op"))
  }
}
