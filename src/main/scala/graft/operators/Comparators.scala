package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.jaro_winkler_sim

/** Comparison-level builders for Fellegi-Sunter gamma columns — the
  * Splink-style comparison library. Each builder returns an integer level
  * column with HIGHER = STRONGER agreement: max level = arity − 1 (total
  * agreement), 0 = disagreement. Feed the columns to
  * [[FellegiSunter.fitLevels]]/[[FellegiSunter.scoreLevels]] with the
  * matching arity.
  *
  * Missing data: NULL on either side yields a NULL gamma — the "missing"
  * level [[FellegiSunter.score]]/`scoreLevels` treat as evidence-free
  * (factor 1.0 in both likelihoods), and `fit`/`fitLevels` reject loudly
  * (complete-case EM). The guard is explicit because a bare
  * `when(a === b, …).otherwise(0)` would silently score missing as
  * DISAGREEMENT — the classic gamma bug.
  *
  * All builders are pure codegen projections (when-chains over stock
  * expressions + the JW kernel); the comparison pass stays inside
  * whole-stage codegen regardless of how many fields are compared. */
object Comparators {

  private def guarded(a: Column, b: Column)(body: Column): Column =
    when(a.isNull || b.isNull, lit(null).cast("long")).otherwise(body)

  /** Arity 2: exact equality. */
  def exactLevels(a: Column, b: Column): Column =
    guarded(a, b)(when(a === b, 1L).otherwise(0L))

  /** Arity 3 string comparison (Splink's default name shape):
    * 2 = byte-exact, 1 = Jaro-Winkler ≥ `fuzzy`, 0 = else. */
  def stringLevels(a: Column, b: Column, fuzzy: Double = 0.88): Column =
    guarded(a, b)(
      when(a === b, 2L)
        .when(jaro_winkler_sim(a, b) >= fuzzy, 1L)
        .otherwise(0L))

  /** Arity 3 phonetic string comparison: 2 = byte-exact, 1 = same
    * American Soundex key ([[Phonetic.soundexKey]]), 0 = else. */
  def phoneticLevels(a: Column, b: Column): Column =
    guarded(a, b)(
      when(a === b, 2L)
        .when(Phonetic.soundexKey(a) === Phonetic.soundexKey(b), 1L)
        .otherwise(0L))

  private def bandedLevels(a: Column, b: Column, diff: Column,
      bands: Seq[Double]): Column = {
    require(bands.nonEmpty, "at least one band required")
    require(bands.forall(_ > 0) && bands == bands.sorted &&
      bands.distinct == bands,
      s"bands must be positive and strictly increasing, got $bands")
    val top = bands.size + 1
    val exact = when(a === b, top.toLong)
    val chain = bands.zipWithIndex.foldLeft(exact) { case (acc, (w, i)) =>
      acc.when(diff <= w, (top - 1 - i).toLong)
    }
    guarded(a, b)(chain.otherwise(0L))
  }

  /** Arity bands.size + 2 numeric comparison by ABSOLUTE difference:
    * top = exact, then one level per widening band (|a−b| ≤ bandᵢ),
    * 0 = outside all bands. `bands` strictly increasing. */
  def numericAbsLevels(a: Column, b: Column, bands: Seq[Double]): Column =
    bandedLevels(a, b, abs(a - b), bands)

  /** Arity bands.size + 2 numeric comparison by RELATIVE difference:
    * |a−b| ≤ bandᵢ · max(|a|, |b|) — Splink's percentage-difference
    * levels. Pinned op order: abs(a−b) on the left, band · greatest of
    * the absolutes on the right, one compare per band (the oracle
    * replays the identical IEEE ops). */
  def numericPctLevels(a: Column, b: Column, bands: Seq[Double]): Column = {
    require(bands.nonEmpty, "at least one band required")
    require(bands.forall(_ > 0) && bands == bands.sorted &&
      bands.distinct == bands,
      s"bands must be positive and strictly increasing, got $bands")
    val top = bands.size + 1
    val d = abs(a - b)
    val scale = greatest(abs(a), abs(b))
    val exact = when(a === b, top.toLong)
    val chain = bands.zipWithIndex.foldLeft(exact) { case (acc, (p, i)) =>
      acc.when(d <= lit(p) * scale, (top - 1 - i).toLong)
    }
    guarded(a, b)(chain.otherwise(0L))
  }

  /** Arity dayBands.size + 2 date comparison: top = same day, then one
    * level per widening |datediff| band, 0 = outside. */
  def dateLevels(a: Column, b: Column, dayBands: Seq[Int]): Column =
    bandedLevels(a, b, abs(datediff(a, b)).cast("double"),
      dayBands.map(_.toDouble))
}
