package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SUPERVISED match-weight learning — the labeled-data complement to
  * [[FellegiSunter]]'s unsupervised EM: when a review queue
  * ([[FellegiSunter.uncertaintySample]] → human decisions) has produced
  * labeled pairs, fit a linear match score over the binary comparison
  * vector by batch gradient descent and score/classify every candidate
  * pair with the learned weights (the Splink "estimate from labels"
  * path).
  *
  * Model: z = b + Σⱼ wⱼ·γⱼ, p = σ(z) with the RATIONAL softsign link
  * σ(z) = 0.5 + 0.5·(z / (1 + |z|)) — chosen over the logistic sigmoid
  * because it is pure field arithmetic (one abs, one divide): the fit
  * and the scoring projection are bit-reproducible across engines,
  * where exp() would inherit libm rounding (the same determinism
  * discipline as the log-free rational idf and the rational temporal
  * decay). Updates are the canonical delta rule wⱼ ← wⱼ − η·(∇ⱼ/N)
  * with ∇ⱼ = Σ n·(p − t)·γⱼ over label-pattern cells.
  *
  * Scale shape (the [[FellegiSunter.fit]] contract): ONE distributed
  * map-side-combined groupBy folds the corpus to ≤ 2^(k+1) (pattern,
  * label) count cells; the driver iterates over that model-sized table
  * with a PINNED fold order (cells sorted by (γ₀..γₖ, t), sums
  * accumulated left-to-right, updates in index order), so the fitted
  * weights are exactly reproducible regardless of partitioning — and an
  * oracle unrolling the same folds in SQL reproduces them bit-for-bit.
  * Scoring is a literal-folded whole-stage-codegen projection; the data
  * never moves for the fit beyond the one aggregate.
  *
  * Gammas must be non-null 0/1 integers and the label non-null 0/1
  * (complete-case, enforced loudly — a null gamma silently scored as
  * disagreement is the classic gamma bug). */
object SupervisedWeights {

  /** Fitted weights. `bias` is w₀; `weights(j)` pairs with gammaCols(j). */
  final case class Model(bias: Double, weights: Array[Double],
      eta: Double, iters: Int) {
    require(weights.length <= 16, "at most 16 gamma columns")
  }

  /** The rational softsign link σ(z) = 0.5 + 0.5·(z/(1+|z|)) — scalar. */
  def softsign(z: Double): Double = 0.5 + 0.5 * (z / (1.0 + math.abs(z)))

  /** [[softsign]] as a Column with the identical operand order. */
  def softsignCol(z: Column): Column =
    lit(0.5) + lit(0.5) * (z / (lit(1.0) + abs(z)))

  /** Fit by `iters` batch-gradient steps at rate `eta` from w = 0.
    * One distributed pass; the driver loop touches only the ≤ 2^(k+1)
    * sufficient cells. */
  def fit(pairs: DataFrame, gammaCols: Seq[String], labelCol: String,
      eta: Double = 0.5, iters: Int = 20): Model = {
    require(gammaCols.nonEmpty && gammaCols.size <= 16,
      s"need 1..16 gamma columns, got ${gammaCols.size}")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(eta > 0, s"eta must be > 0, got $eta")
    val k = gammaCols.size
    // 2^(k+1) is the largest legitimate cell count; cap the fetch ONE row
    // above it so a continuous/high-cardinality column passed as a gamma
    // fails loudly instead of collecting a corpus-sized frame
    val maxCells = 1 << (k + 1)
    val fetched = pairs
      .groupBy((gammaCols :+ labelCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .limit(maxCells + 1)
      .collect()
    require(fetched.length <= maxCells,
      s"more than $maxCells (pattern, label) cells — gammas/label must " +
        "be 0/1 (a non-binary column was passed as a gamma?)")
    val cells = fetched
      .map { r =>
        val gs = Array.tabulate(k) { j =>
          require(!r.isNullAt(j),
            s"null gamma in column '${gammaCols(j)}' — gammas must be " +
              "non-null 0/1 (complete-case fit; filter or impute first)")
          val v = r.getAs[Number](j).longValue
          require(v == 0L || v == 1L,
            s"gamma column '${gammaCols(j)}' must be 0/1, saw $v")
          v
        }
        require(!r.isNullAt(k),
          s"null label in column '$labelCol' — labels must be non-null 0/1")
        val t = r.getAs[Number](k).longValue
        require(t == 0L || t == 1L,
          s"label column '$labelCol' must be 0/1, saw $t")
        (gs, t, r.getAs[Number](k + 1).longValue.toDouble)
      }
      // pinned fold order: (γ₀..γₖ, t) ascending — the oracle's ORDER BY
      // (gammas are 0/1 and equal-length, so the string sort IS the
      // lexicographic tuple sort)
      .sortBy { case (gs, t, _) => (gs.mkString, t) }
    require(cells.nonEmpty, "no rows to fit on")
    // N is iteration-invariant; fold it once in the same pinned order
    var tot = 0.0
    cells.foreach { case (_, _, n) => tot += n }
    val w = Array.fill(k + 1)(0.0)
    for (_ <- 1 to iters) {
      val grad = Array.fill(k + 1)(0.0)
      cells.foreach { case (gs, tL, n) =>
        val t = tL.toDouble
        // z mirrors the oracle's CASE chain: + wⱼ when γⱼ = 1, + 0.0 else
        var z = w(0)
        var j = 0
        while (j < k) {
          z += (if (gs(j) == 1L) w(j + 1) else 0.0); j += 1
        }
        val p = softsign(z)
        grad(0) += n * (p - t)
        j = 0
        while (j < k) {
          grad(j + 1) += (if (gs(j) == 1L) n * (p - t) else 0.0); j += 1
        }
      }
      var j = 0
      while (j <= k) { w(j) = w(j) - eta * (grad(j) / tot); j += 1 }
    }
    Model(w(0), w.drop(1), eta, iters)
  }

  /** Literal-folded scoring projection: input columns + (z, p, decision)
    * with decision = link ⇔ p ≥ 0.5. Pure codegen — the model rides as
    * constants. */
  def score(pairs: DataFrame, gammaCols: Seq[String], model: Model): DataFrame = {
    require(gammaCols.size == model.weights.length,
      s"model has ${model.weights.length} weights, got ${gammaCols.size} gammas")
    val z = gammaCols.zipWithIndex.foldLeft(lit(model.bias)) {
      case (acc, (g, j)) =>
        acc + when(col(g) === 1, lit(model.weights(j))).otherwise(lit(0.0))
    }
    pairs.withColumn("z", z)
      .withColumn("p", softsignCol(col("z")))
      .withColumn("decision",
        when(col("p") >= 0.5, lit("link")).otherwise(lit("non_link")))
  }

  /** The fitted weights as a 1-row frame (bias, w_<gamma>...) — the
    * inspectable/persistable face of the model. */
  def weightsFrame(spark: org.apache.spark.sql.SparkSession,
      gammaCols: Seq[String], model: Model): DataFrame = {
    val cols = lit(model.bias).as("bias") +:
      gammaCols.zipWithIndex.map { case (g, j) =>
        lit(model.weights(j)).as(s"w_$g")
      }
    spark.range(1).select(cols: _*)
  }
}
