package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter privacy-preserving record linkage (PPRL) kernels —
  * cryptographic long-term keys (CLK) per Schnell, Bachteler & Reiher
  * (2009/2011): each identifier is encoded as an m-bit Bloom filter of
  * its padded code-point bigrams, g bit positions per bigram derived by
  * Kirsch-Mitzenmacher double hashing over sha256 — position_i =
  * (h1 + i·h2) mod m with h1/h2 the digest's first/second big-endian
  * 32-bit words. Two encoded records compare with DICE over the bitsets
  * (Schnell's published comparator: Dice, not Jaccard — Bloom collisions
  * bias Jaccard harder). The party doing the linkage never sees the
  * identifiers, only the filters; similarity survives typos because
  * bigram sets overlap.
  *
  * Everything is deterministic and integer-exact, so a SQL oracle can
  * replay the whole construction from sha256 hex (the q_clk_bits /
  * q_clk_dice gates do). Production comparisons run on the PACKED form
  * (array of m/64 longs, [[BloomKernels.clkSig]]) with
  * `Long.bitCount` — no per-bit rows anywhere in the hot path. */
object BloomKernels {

  private val MaxBits = 1 << 20

  private[graft] def requireParams(m: Int, g: Int): Unit = {
    require(m > 0 && m <= MaxBits, s"m must be in [1, $MaxBits], got $m")
    require(g > 0 && g <= 64, s"g must be in [1, 64], got $g")
  }

  /** Underscore-padded code-point bigram byte spans of `s`: bigrams of
    * "_" ++ s ++ "_" — the sentinel padding Schnell's construction uses
    * so first/last characters carry positional signal. The padded buffer
    * is materialized once; each bigram is a byte span over it. */
  private def foreachPaddedBigram(s: UTF8String)(
      f: (Array[Byte], Int, Int) => Unit): Unit = {
    val sb = s.getBytes
    val bytes = new Array[Byte](sb.length + 2)
    bytes(0) = '_'.toByte
    System.arraycopy(sb, 0, bytes, 1, sb.length)
    bytes(sb.length + 1) = '_'.toByte
    val n = bytes.length
    // code-point starts (padding bytes are ASCII, so they are boundaries)
    var prev = 0
    var i = UTF8String.numBytesForFirstByte(bytes(0))
    while (i < n) {
      val next = i + UTF8String.numBytesForFirstByte(bytes(i))
      f(bytes, prev, next)
      prev = i
      i = next
    }
  }

  /** Big-endian unsigned 32-bit word at `off` — exactly what a SQL oracle
    * recovers by nibble-parsing hex chars [2·off+1, 2·off+8]. */
  private def u32(d: Array[Byte], off: Int): Long =
    ((d(off) & 0xFFL) << 24) | ((d(off + 1) & 0xFFL) << 16) |
      ((d(off + 2) & 0xFFL) << 8) | (d(off + 3) & 0xFFL)

  private def setBits(s: UTF8String, m: Int, g: Int,
      salt: Array[Byte]): Array[Boolean] = {
    val md = MinHashKernels.shaDigest.get()
    val bits = new Array[Boolean](m)
    foreachPaddedBigram(s) { (bytes, from, until) =>
      md.reset()
      if (salt.length > 0) md.update(salt)
      md.update(bytes, from, until - from)
      val d = md.digest()
      val h1 = u32(d, 0)
      val h2 = u32(d, 4)
      var i = 0
      while (i < g) {
        bits(((h1 + i * h2) % m).toInt) = true
        i += 1
      }
    }
    bits
  }

  /** Sorted distinct set bit positions (array<int>) — the oracle-facing
    * form; one row per bit when exploded. */
  def clkBits(s: UTF8String, m: Int, g: Int, salt: Array[Byte]): ArrayData = {
    val bits = setBits(s, m, g, salt)
    var c = 0
    var i = 0
    while (i < m) { if (bits(i)) c += 1; i += 1 }
    val out = new Array[Int](c)
    var j = 0
    i = 0
    while (i < m) {
      if (bits(i)) { out(j) = i; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Packed filter: m/64 longs, bit p stored in word p >> 6 at bit
    * p & 63 — the production form [[bloomDice]] compares with popcounts.
    * m must be a multiple of 64. */
  def clkSig(s: UTF8String, m: Int, g: Int, salt: Array[Byte]): ArrayData = {
    val bits = setBits(s, m, g, salt)
    val words = new Array[Long](m >> 6)
    var i = 0
    while (i < m) {
      if (bits(i)) words(i >> 6) |= 1L << (i & 63)
      i += 1
    }
    new GenericArrayData(words)
  }

  /** Dice coefficient 2·|A∧B| / (|A|+|B|) of two equal-length packed
    * filters. Both-empty → 1.0 (the ""-vs-"" = 1.0 convention every
    * strsim kernel here shares). Unequal lengths = different m — a user
    * error worth failing loudly on, not a 0.0. */
  def bloomDice(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"bloom_dice: filters differ in length (${n} vs ${b.numElements()} words — built with different m?)")
    var inter = 0
    var ca = 0
    var cb = 0
    var i = 0
    while (i < n) {
      val wa = a.getLong(i)
      val wb = b.getLong(i)
      inter += java.lang.Long.bitCount(wa & wb)
      ca += java.lang.Long.bitCount(wa)
      cb += java.lang.Long.bitCount(wb)
      i += 1
    }
    if (ca + cb == 0) 1.0 else 2.0 * inter / (ca + cb)
  }
}

/** Shared shape of the two CLK encoders: unary over string, fixed
  * (m, g, salt). The salt keys the construction (sha256(salt || bigram))
  * — unsalted CLKs are dictionary-attackable, so deployments agree on a
  * secret salt per linkage project; "" reproduces the unkeyed form. */
abstract class ClkExpression extends UnaryExpression with Serializable {
  def m: Int
  def g: Int
  def salt: String
  BloomKernels.requireParams(m, g)
  protected lazy val saltBytes: Array[Byte] = salt.getBytes("UTF-8")
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }
}

/** clk_bits(s, m, g) → sorted distinct set-bit positions of the CLK Bloom
  * filter (array<int>) — the oracle/debug form. */
case class ClkBits(child: Expression, m: Int, g: Int, salt: String = "")
    extends ClkExpression {
  override def prettyName: String = "clk_bits"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    BloomKernels.clkBits(v.asInstanceOf[UTF8String], m, g, saltBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("clkSalt", saltBytes, "byte[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.BloomKernels.clkBits($v, $m, $g, $saltRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** clk_sig(s, m, g) → packed CLK Bloom filter (array of m/64 longs) —
  * the production form [[BloomDice]] compares with popcounts. */
case class ClkSig(child: Expression, m: Int, g: Int, salt: String = "")
    extends ClkExpression {
  require(m % 64 == 0, s"clk_sig: m must be a multiple of 64, got $m")
  override def prettyName: String = "clk_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    BloomKernels.clkSig(v.asInstanceOf[UTF8String], m, g, saltBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("clkSalt", saltBytes, "byte[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.BloomKernels.clkSig($v, $m, $g, $saltRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** bloom_dice(a, b) → Dice coefficient of two packed filters. */
case class BloomDice(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def prettyName: String = "bloom_dice"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    BloomKernels.bloomDice(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BloomKernels.bloomDice($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
