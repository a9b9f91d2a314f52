package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi-Sunter probabilistic record linkage: fit per-field match /
  * non-match agreement probabilities by EM over comparison-vector pattern
  * counts, then score candidate pairs with the fitted model.
  *
  * The model (Fellegi & Sunter 1969; the estimation shape popularized by
  * Splink/FEBRL): each candidate pair carries a comparison vector
  * γ = (γ_0 … γ_{k-1}) of 0/1 field-agreement indicators (e.g. "name JW
  * ≥ 0.95", "segment equal"). Under conditional independence,
  *
  *   P(γ | match)     = Π_j m_j^γ_j (1 − m_j)^{1−γ_j}
  *   P(γ | non-match) = Π_j u_j^γ_j (1 − u_j)^{1−γ_j}
  *
  * and EM estimates (λ, m, u) from the UNLABELED pattern counts alone —
  * the reason this is the canonical ER scoring model: no training labels
  * needed.
  *
  * Scale design (100 TB): the only distributed work is ONE partial-combined
  * `groupBy` collapsing the pair corpus to ≤ 2^k pattern-count rows; the
  * EM iterations run on the driver over that model-sized table (same
  * bounded-collect pattern as [[Similarity]]'s IVF centroid fit — the
  * collect is k-bounded by the `require`, never data-sized). Scoring is a
  * pure codegen projection with the fitted parameters folded in as
  * literals — zero shuffle, no UDF. Callers scoring the same gamma frame
  * they fit on should persist it (fit's aggregate and score's projection
  * otherwise each re-derive the comparison vectors).
  *
  * Determinism contract (the driver gate hash-checks this): every
  * floating-point operation is pinned — pattern traversal is lexicographic
  * in (γ_0 … γ_{k-1}), accumulations are left folds in that order, and the
  * update formulas are applied verbatim as written — so an oracle that
  * replays the same folds (SparkEntry's unrolled-EM DuckDB SQL) reproduces
  * the parameters, posteriors, and likelihood ratios bit-for-bit.
  */
object FellegiSunter {

  /** Fitted model: λ = P(match), m_j = P(γ_j = 1 | match),
    * u_j = P(γ_j = 1 | non-match). */
  final case class Model(lambda: Double, m: IndexedSeq[Double], u: IndexedSeq[Double])

  /** EM fit over the pattern counts of `gammaCols` (integer 0/1 columns of
    * `pairs`). `iters` full EM sweeps from (initLambda, initM, initU). */
  def fit(pairs: DataFrame, gammaCols: Seq[String], iters: Int = 15,
      initLambda: Double = 0.5, initM: Double = 0.9,
      initU: Double = 0.1): Model = {
    val k = gammaCols.size
    require(k >= 1 && k <= 16,
      s"gammaCols must have 1..16 fields (driver EM holds 2^k pattern counts), got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // the one distributed pass: pair corpus -> <= 2^k (pattern, count) rows
    val rows = pairs.groupBy(gammaCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).collect()
    import scala.math.Ordering.Implicits._
    val pats: Array[(IndexedSeq[Long], Double)] = rows.map { r =>
      val g = gammaCols.indices.map { i =>
        require(!r.isNullAt(i),
          s"gamma column '${gammaCols(i)}' is NULL for some pairs — gamma " +
            "comparisons must be null-absorbing (wrap in when(...).otherwise(0))")
        r.getAs[Number](i).longValue
      }
      (g, r.getAs[Long]("__n").toDouble)
    }.sortBy(_._1)
    var t = 0.0
    pats.foreach { case (_, n) => t = t + n }

    var lam = initLambda
    val m = Array.fill(k)(initM)
    val u = Array.fill(k)(initU)
    for (_ <- 0 until iters) {
      var s = 0.0
      val a = Array.fill(k)(0.0)
      val b = Array.fill(k)(0.0)
      pats.foreach { case (g, n) =>
        var w = lam
        var v = 1.0 - lam
        var j = 0
        while (j < k) {
          w = w * (if (g(j) == 1L) m(j) else 1.0 - m(j))
          v = v * (if (g(j) == 1L) u(j) else 1.0 - u(j))
          j += 1
        }
        s = s + n * (w / (w + v))
        j = 0
        while (j < k) {
          a(j) = a(j) + (if (g(j) == 1L) n * (w / (w + v)) else 0.0)
          b(j) = b(j) + (if (g(j) == 1L) n * (1.0 - w / (w + v)) else 0.0)
          j += 1
        }
      }
      lam = s / t
      var j = 0
      while (j < k) {
        m(j) = a(j) / s
        u(j) = b(j) / (t - s)
        j += 1
      }
    }
    Model(lam, m.toIndexedSeq, u.toIndexedSeq)
  }

  /** Score pairs under a fitted model: appends `posterior` = P(match | γ)
    * and `lr` = P(γ|match)·λ over P(γ|non-match)·(1−λ) — the (prior-folded)
    * likelihood ratio whose log is the classic FS match weight (left as a
    * ratio: logs would cost bit-exactness across engines for nothing).
    * Pure projection; the model rides as literals. */
  def score(pairs: DataFrame, gammaCols: Seq[String], model: Model): DataFrame = {
    require(gammaCols.size == model.m.size,
      s"model has ${model.m.size} fields, gammaCols has ${gammaCols.size}")
    var w: Column = lit(model.lambda)
    var v: Column = lit(1.0 - model.lambda)
    for (j <- gammaCols.indices) {
      w = w * when(col(gammaCols(j)) === 1, lit(model.m(j)))
        .otherwise(lit(1.0 - model.m(j)))
      v = v * when(col(gammaCols(j)) === 1, lit(model.u(j)))
        .otherwise(lit(1.0 - model.u(j)))
    }
    pairs.withColumn("posterior", w / (w + v)).withColumn("lr", w / v)
  }

  /** Multi-level model (Splink-style comparison levels): field j takes
    * γ_j ∈ {0 … L_j−1} (0 = disagreement, higher = stronger agreement by
    * convention) with full per-level distributions m(j)(l) = P(γ_j = l |
    * match), u(j)(l) = P(γ_j = l | non-match). The binary [[Model]] is the
    * L = 2 special case. */
  final case class LevelModel(lambda: Double,
      m: IndexedSeq[IndexedSeq[Double]], u: IndexedSeq[IndexedSeq[Double]])

  /** EM fit with multi-level gammas. `levels(j)` = number of levels of
    * `gammaCols(j)`. Init breaks symmetry deterministically: m(j)(l) ∝
    * l+1 (matches favor high agreement levels), u(j)(l) ∝ L−l. Same
    * pinned-fold determinism contract as [[fit]] — the unrolled-EM DuckDB
    * oracle reproduces it bit-for-bit. */
  def fitLevels(pairs: DataFrame, gammaCols: Seq[String], levels: Seq[Int],
      iters: Int = 15, initLambda: Double = 0.5): LevelModel = {
    val k = gammaCols.size
    require(k >= 1 && k == levels.size,
      s"gammaCols (${k}) and levels (${levels.size}) must align, nonempty")
    require(levels.forall(l => l >= 2 && l <= 16), s"levels must be 2..16: $levels")
    require(levels.map(_.toLong).product <= 65536L,
      s"pattern space ${levels.mkString("x")} exceeds the 2^16 driver bound")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val rows = pairs.groupBy(gammaCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).collect()
    import scala.math.Ordering.Implicits._
    val pats: Array[(IndexedSeq[Long], Double)] = rows.map { r =>
      val g = gammaCols.indices.map { i =>
        require(!r.isNullAt(i),
          s"gamma column '${gammaCols(i)}' is NULL for some pairs — gamma " +
            "comparisons must be null-absorbing (wrap in when(...).otherwise(0))")
        r.getAs[Number](i).longValue
      }
      (g, r.getAs[Long]("__n").toDouble)
    }.sortBy(_._1)
    var t = 0.0
    pats.foreach { case (_, n) => t = t + n }

    var lam = initLambda
    val m = Array.tabulate(k) { j =>
      val lv = levels(j); val tot = (lv * (lv + 1) / 2).toDouble
      Array.tabulate(lv)(l => (l + 1).toDouble / tot)
    }
    val u = Array.tabulate(k) { j =>
      val lv = levels(j); val tot = (lv * (lv + 1) / 2).toDouble
      Array.tabulate(lv)(l => (lv - l).toDouble / tot)
    }
    for (_ <- 0 until iters) {
      var s = 0.0
      val a = Array.tabulate(k)(j => Array.fill(levels(j))(0.0))
      val b = Array.tabulate(k)(j => Array.fill(levels(j))(0.0))
      pats.foreach { case (g, n) =>
        var w = lam
        var v = 1.0 - lam
        var j = 0
        while (j < k) {
          // out-of-range gammas take the top level (the scoreLevels
          // CASE's otherwise-branch) — callers should not rely on it
          val l = math.min(math.max(g(j), 0L), (levels(j) - 1).toLong).toInt
          w = w * m(j)(l)
          v = v * u(j)(l)
          j += 1
        }
        s = s + n * (w / (w + v))
        j = 0
        while (j < k) {
          val l = math.min(math.max(g(j), 0L), (levels(j) - 1).toLong).toInt
          a(j)(l) = a(j)(l) + n * (w / (w + v))
          b(j)(l) = b(j)(l) + n * (1.0 - w / (w + v))
          j += 1
        }
      }
      lam = s / t
      var j = 0
      while (j < k) {
        var l = 0
        while (l < levels(j)) {
          m(j)(l) = a(j)(l) / s
          u(j)(l) = b(j)(l) / (t - s)
          l += 1
        }
        j += 1
      }
    }
    LevelModel(lam, m.map(_.toIndexedSeq).toIndexedSeq,
      u.map(_.toIndexedSeq).toIndexedSeq)
  }

  /** Score pairs under a multi-level model: appends `posterior` and `lr`
    * like [[score]]; per field the probability is a level-indexed CASE
    * (γ beyond the last level falls into the top level's branch). */
  def scoreLevels(pairs: DataFrame, gammaCols: Seq[String],
      model: LevelModel): DataFrame = {
    require(gammaCols.size == model.m.size,
      s"model has ${model.m.size} fields, gammaCols has ${gammaCols.size}")
    def levelCase(g: String, probs: IndexedSeq[Double]): Column = {
      val init: Column = when(col(g) === 0, lit(probs(0)))
      (1 until probs.size - 1).foldLeft(init) { (acc, l) =>
        acc.when(col(g) === l, lit(probs(l)))
      }.otherwise(lit(probs.last))
    }
    var w: Column = lit(model.lambda)
    var v: Column = lit(1.0 - model.lambda)
    for (j <- gammaCols.indices) {
      w = w * levelCase(gammaCols(j), model.m(j))
      v = v * levelCase(gammaCols(j), model.u(j))
    }
    pairs.withColumn("posterior", w / (w + v)).withColumn("lr", w / v)
  }

  /** Relative value frequencies of `valueCol` among `records`:
    * (value, tf) with tf = count(value) / count(*). The input to
    * [[tfAdjustLr]]; persist it once per field, reuse across runs. */
  def termFrequencies(records: DataFrame, valueCol: String): DataFrame =
    records.groupBy(col(valueCol).as("value"))
      .agg(count(lit(1)).as("__cnt"))
      .crossJoin(broadcast(records.agg(count(lit(1)).as("__tot"))))
      .select(col("value"),
        (col("__cnt").cast("double") / col("__tot").cast("double")).as("tf"))

  /** Term-frequency adjustment (Winkler 1988; the shape popularized by
    * Splink's `term_frequency_adjustments`) for an EXACT-agreement field:
    * agreeing on a rare value is stronger evidence than agreeing on a
    * common one, so for pairs where `gammaCol` = 1 the pair's likelihood
    * ratio is multiplied by `u_j / tf(value)` — replacing the field's
    * AVERAGE agreement-by-chance rate with the agreed value's own
    * frequency. Disagreements, and values missing from `tf`, keep the
    * unadjusted ratio. Appends `lr_tf`.
    *
    * Only meaningful for equality-style gammas (the two sides share one
    * value, carried in `valueCol`); threshold/fuzzy gammas have no single
    * agreed value to look up. `tf` is vocabulary-sized and broadcast by
    * default; pass `broadcastTf = false` for pathological vocabularies
    * (the unhinted plan degrades to a shuffle join). */
  def tfAdjustLr(scored: DataFrame, model: Model, fieldIndex: Int,
      gammaCol: String, valueCol: String, tf: DataFrame,
      lrCol: String = "lr", broadcastTf: Boolean = true): DataFrame = {
    require(fieldIndex >= 0 && fieldIndex < model.u.size,
      s"fieldIndex $fieldIndex out of range for a ${model.u.size}-field model")
    val u = model.u(fieldIndex)
    val tfSide = tf.select(col("value").as("__tf_value"), col("tf").as("__tf"))
    val hinted = if (broadcastTf) broadcast(tfSide) else tfSide
    scored.join(hinted, scored(valueCol) === col("__tf_value"), "left")
      .withColumn("lr_tf",
        when(col(gammaCol) === 1 && col("__tf").isNotNull,
          col(lrCol) * (lit(u) / col("__tf")))
          .otherwise(col(lrCol)))
      .drop("__tf_value", "__tf")
  }

  /** The Fellegi-Sunter decision rule (the other half of the 1969 paper):
    * band the likelihood ratio into `link` (lr ≥ upperLr) / `possible`
    * (the clerical-review band) / `non_link` (lr ≤ lowerLr). In production
    * the thresholds are chosen from target false-match/false-non-match
    * rates; here they are caller-supplied. Pure projection. */
  def classify(scored: DataFrame, upperLr: Double, lowerLr: Double,
      lrCol: String = "lr"): DataFrame = {
    require(lowerLr <= upperLr,
      s"lowerLr ($lowerLr) must be <= upperLr ($upperLr)")
    scored.withColumn("decision",
      when(col(lrCol) >= upperLr, lit("link"))
        .when(col(lrCol) <= lowerLr, lit("non_link"))
        .otherwise(lit("possible")))
  }
}
