package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine-similarity kernel over float-vector columns.
  *
  * Why an expression and not `aggregate(zip_with(...))`: Spark's
  * higher-order functions evaluate their lambdas interpreted (no
  * whole-stage codegen), which makes brute-force ANN ~20× slower than a
  * fused loop. This expression emits ONE static call inside codegen.
  *
  * Bit-exactness contract (the DuckDB oracle depends on it): dot, ‖a‖²,
  * ‖b‖² are independent strict left folds in double over array order —
  * accumulating all three in one fused loop yields the identical IEEE
  * results as three separate folds, so `dot / (sqrt(na) * sqrt(nb))`
  * matches `list_sum(list_transform(...)) / (sqrt(...) * sqrt(...))`.
  */
object VectorKernels {
  /** Packed sign bits of `planes.length` hyperplane projections: bit p is
    * set iff dot(v, planes(p)) > 0, each dot a strict left fold in double
    * (identical to DuckDB `list_sum(list_transform(...)) > 0`, which keeps
    * the LSH bucket assignment oracle-checkable with the planes inlined as
    * SQL literals). */
  def sigBits(v: ArrayData, planes: Array[Array[Double]]): Int = {
    var sig = 0
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      val n = math.min(v.numElements(), pl.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        d += v.getFloat(i).toDouble * pl(i)
        i += 1
      }
      if (d > 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** Fused cosine: dot over the common prefix, each norm over its OWN
    * full array — so `dotF(a,b) / (normF(a) * normF(b))` is bit-identical
    * to `cosineF(a,b)` for EVERY input, including length-mismatched
    * vectors (the tail loops extend the same strict left folds, so the
    * addition order matches [[normF]] exactly). Equal-length inputs (the
    * only shape the ANN operators produce) never enter the tails. */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val an = a.numElements()
    val bn = b.numElements()
    val n = math.min(an, bn)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    var j = n
    while (j < an) {
      val x = a.getFloat(j).toDouble
      na += x * x
      j += 1
    }
    var k = n
    while (k < bn) {
      val y = b.getFloat(k).toDouble
      nb += y * y
      k += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Strict left-fold dot product in double — the identical fold
    * [[cosineF]] accumulates, exposed separately so ANN operators can
    * precompute per-VECTOR norms once instead of re-folding both norms
    * inside every pair: `dotF(a,b) / (normF(a) * normF(b))` is
    * bit-identical to `cosineF(a,b)` (same folds, same sqrt, same
    * division) at a third of the per-pair flops. */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  /** sqrt of the strict left-fold sum of squares — [[cosineF]]'s norm. */
  def normF(a: ArrayData): Double = {
    val n = a.numElements()
    var na = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      na += x * x
      i += 1
    }
    math.sqrt(na)
  }
}

/** hyperplane_sig(array<float>) → int: packed sign pattern of one LSH
  * band's hyperplane projections. A fused codegen kernel for the same
  * reason as [[CosineSim]] — the higher-order-function form evaluates its
  * lambdas interpreted, ~20× slower, which made band-key computation
  * dominate LSH ANN. The plane matrix rides along as a codegen reference
  * object (plan-compile-time constant, never shipped per row).
  *
  * The planes are held as `Seq[Seq[Double]]`, NOT arrays: case-class
  * equals/hashCode on an Array compare by reference, so two semantically
  * identical HyperplaneSig nodes would never be equal and plan
  * canonicalization / subexpression elimination / exchange reuse would
  * silently miss. The kernel still gets a primitive double[][] via a
  * lazily-built (per JVM) mirror. */
case class HyperplaneSig(child: Expression, planes: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {
  @transient private lazy val planesArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_sig"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.catalogString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.sigBits(v.asInstanceOf[ArrayData], planesArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planesArr, "double[][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.VectorKernels.sigBits($v, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** vec_dot(array<float>, array<float>) → double: the strict left-fold
  * dot product (the dot inside [[CosineSim]], fused codegen). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dotF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** vec_norm(array<float>) → double: sqrt of the left-fold sum of squares
  * (the norm inside [[CosineSim]], fused codegen). Precompute it once per
  * vector and `vec_dot(a,b) / (norm_a * norm_b)` is bit-identical to
  * `cosine_sim(a,b)` at a third of the per-pair work. */
case class VecNorm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_norm"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.catalogString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.normF(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.VectorKernels.normF($v)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** cosine_sim(array<float>, array<float>) → double. Null-intolerant;
  * array elements are assumed non-null (embedding columns). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.cosineF($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
