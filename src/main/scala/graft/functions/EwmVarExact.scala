package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** Exact exponentially-weighted mean + variance (RiskMetrics-style
  * volatility) as a window aggregate:
  *
  *   m_0 = x_0,  v_0 = 0
  *   d   = x_t − m_{t−1}
  *   m_t = α·x_t + (1−α)·m_{t−1}
  *   v_t = (1−α)·v_{t−1} + α·d·d·(1−α)
  *
  * (the West/Welford EW update: the d² term is discounted by (1−α) so v is
  * the EW second central moment about the UPDATED mean — v ≥ 0 always).
  * One pass per series over a running frame, two doubles of state; like
  * [[EmaExact]]/[[HoltExact]] the recursion is inherently sequential, so
  * partial-aggregate merge is unsupported by construction and the
  * expression is window-only. Every step is a fixed-order IEEE expression,
  * so a recursive-CTE replay matches bit-for-bit. Null inputs keep state.
  *
  * Reference scope note: tempo has no EW variance — this extends its `ema`
  * family (/root/reference/python/tempo/tsdf.py:1044-1071) with the
  * volatility estimate a risk/anomaly pipeline pairs with it. */
case class EwmVarExact(
    child: Expression,
    alpha: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[EwmVarExact.Buf] with UnaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("mean", DoubleType), StructField("variance", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ewm_var_exact"

  override def createAggregationBuffer(): EwmVarExact.Buf =
    new EwmVarExact.Buf(false, 0.0, 0.0)

  override def update(b: EwmVarExact.Buf, input: InternalRow): EwmVarExact.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (b.set) {
        val d = x - b.mean
        b.mean = alpha * x + (1 - alpha) * b.mean
        b.variance = (1 - alpha) * b.variance + alpha * d * d * (1 - alpha)
      } else {
        b.mean = x
        b.variance = 0.0
        b.set = true
      }
    }
    b
  }

  override def merge(b: EwmVarExact.Buf, other: EwmVarExact.Buf): EwmVarExact.Buf =
    throw new UnsupportedOperationException(
      "graft_ewm_var_exact is a window-only aggregate: the mean/variance " +
        "recursion cannot be merged from partial aggregates; use it over " +
        "a running window frame")

  override def eval(b: EwmVarExact.Buf): Any =
    if (b.set) new GenericInternalRow(Array[Any](b.mean, b.variance)) else null

  override def serialize(b: EwmVarExact.Buf): Array[Byte] = {
    val buf = ByteBuffer.allocate(17)
    buf.put(if (b.set) 1.toByte else 0.toByte)
    buf.putDouble(b.mean)
    buf.putDouble(b.variance)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): EwmVarExact.Buf = {
    val buf = ByteBuffer.wrap(bytes)
    new EwmVarExact.Buf(buf.get() == 1.toByte, buf.getDouble(), buf.getDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): EwmVarExact =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): EwmVarExact =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): EwmVarExact =
    copy(child = newChild)
}

object EwmVarExact {
  /** Two doubles of state per series + an initialized flag. */
  final class Buf(var set: Boolean, var mean: Double, var variance: Double)
}
