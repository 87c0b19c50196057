package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit-interleave of 2 or 3 non-negative long keys into one
  * long sort key — the OSS answer to Delta's `OPTIMIZE ... ZORDER BY`
  * (/root/reference/python/tempo/io.py:26-61): sorting by the interleaved
  * value clusters rows so that parquet row-group min/max envelopes stay
  * selective on EVERY interleaved dimension, not just the leading sort
  * column.
  *
  * Inputs are expected to be small bucket ranks (e.g. `width_bucket` output,
  * see [[graft.io.ZOrder]]); only the low 31 (2 keys) or 21 (3 keys) bits
  * participate. Codegen'd via the standard binary-magic-number spread — a
  * handful of shift/mask ops per row, no branches.
  */
object MortonInterleave {

  /** Build the interleave expression for 2 or 3 keys. */
  def apply(children: Seq[Expression]): Expression = children match {
    case Seq(a, b) => Morton2(a, b)
    case Seq(a, b, c) => Morton3(a, b, c)
    case other =>
      throw new IllegalArgumentException(
        s"graft_zorder takes 2 or 3 arguments, got ${other.size}")
  }

  private[functions] def typeCheck(name: String,
      types: Seq[DataType]): TypeCheckResult =
    if (types.forall(_ == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires BIGINT arguments, got " + types.map(_.sql).mkString(", "))

  /** Spread the low 31 bits of x so bit i lands at position 2i
    * (binary magic numbers, the textbook 64-bit Morton spread). */
  def spread2(x0: Long): Long = {
    var x = x0 & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Spread the low 21 bits of x so bit i lands at position 3i. */
  def spread3(x0: Long): Long = {
    var x = x0 & 0x1fffffL
    x = (x | (x << 32)) & 0x001f00000000ffffL
    x = (x | (x << 16)) & 0x001f0000ff0000ffL
    x = (x | (x << 8)) & 0x100f00f00f00f00fL
    x = (x | (x << 4)) & 0x10c30c30c30c30c3L
    x = (x | (x << 2)) & 0x1249249249249249L
    x
  }

  /** Static targets for generated code. */
  def interleave2(a: Long, b: Long): Long = spread2(a) | (spread2(b) << 1)

  def interleave3(a: Long, b: Long, c: Long): Long =
    spread3(a) | (spread3(b) << 1) | (spread3(c) << 2)
}

/** 2-key Morton interleave — see [[MortonInterleave]]. */
case class Morton2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes(): TypeCheckResult =
    MortonInterleave.typeCheck(prettyName, Seq(left.dataType, right.dataType))

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MortonInterleave.interleave2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.MortonInterleave.interleave2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Morton2 =
    copy(left = newLeft, right = newRight)
}

/** 3-key Morton interleave — see [[MortonInterleave]]. */
case class Morton3(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes(): TypeCheckResult =
    MortonInterleave.typeCheck(prettyName,
      Seq(first.dataType, second.dataType, third.dataType))

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    MortonInterleave.interleave3(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.MortonInterleave.interleave3($a, $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Morton3 =
    copy(first = newFirst, second = newSecond, third = newThird)
}
