package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D point — the locality-superior sibling of
  * [[MortonInterleave]] for data layout (Delta's `OPTIMIZE` supports both
  * curves; reference io.py:26-61 is the Z-order write path this module
  * family stands in for). Unlike the Z-curve, every step along the Hilbert
  * curve moves to a Manhattan-adjacent cell (no diagonal "seams"), so rows
  * sorted by this key give parquet row-group min/max envelopes that are
  * never worse and typically tighter per dimension than Morton's.
  *
  * The classic per-level rotate-and-reflect walk (bits iterations of a few
  * shifts/branches, no tables); inputs are bucket ranks in [0, 2^bits).
  * The same loop replays in SQL as a recursive CTE over (x, y, s, d) — see
  * the q_hilbert oracle — keeping the index cross-engine-deterministic:
  * pure integer arithmetic, no floats anywhere.
  */
object HilbertIndex {

  /** d-index of (x, y) on the 2^bits × 2^bits Hilbert curve. Inputs are
    * masked to the low `bits` bits; result < 4^bits. Static target for
    * generated code. */
  def hilbert2(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate the quadrant so the sub-curve orientation chains
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** 2-key Hilbert index expression — see [[HilbertIndex]]. `bits` is a plan
  * constant (the curve order), not a child. */
case class Hilbert2(bits: Int, left: Expression, right: Expression)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"hilbert bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def checkInputDataTypes(): TypeCheckResult =
    MortonInterleave.typeCheck(prettyName, Seq(left.dataType, right.dataType))

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.hilbert2(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HilbertIndex.hilbert2($bits, $a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hilbert2 =
    copy(left = newLeft, right = newRight)
}
