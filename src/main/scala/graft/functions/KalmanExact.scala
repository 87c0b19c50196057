package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** Exact 1-D local-level Kalman filter as a window aggregate: the optimal
  * online smoother for "constant level + white observation noise + slow
  * random drift", the model-based cousin of [[EmaExact]] (an EMA is this
  * filter's steady state — here the gain ADAPTS, starting high while the
  * level is uncertain and settling as evidence accumulates):
  *
  *   m_0 = y_0,  P_0 = p0
  *   P⁻ = P_{t−1} + q            (predict: level drifts by variance q)
  *   K  = P⁻ / (P⁻ + r)          (gain: trust vs observation noise r)
  *   m_t = m_{t−1} + K·(y_t − m_{t−1})
  *   P_t = (1 − K)·P⁻
  *
  * Used over a running frame (unbounded preceding → current row); one pass
  * per series, two doubles of state. The recursion is inherently
  * sequential, so partial-aggregate merge is unsupported by construction
  * and the expression is window-only; [[graft.tsdf.Stats.kalmanLevel]]
  * applies the window. Emits a (level, variance, gain) struct; every step
  * is a fixed-order expression of exactly-rounded IEEE ops (+, −, ×, ÷),
  * so a recursive-CTE replay with the same q/r/p0 literals matches
  * bit-for-bit. Null inputs keep the running state.
  *
  * Reference scope note: tempo has no Kalman smoother — this extends its
  * `ema` family (/root/reference/python/tempo/tsdf.py:1044-1071). */
case class KalmanExact(
    child: Expression,
    q: Double,
    r: Double,
    p0: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KalmanExact.Buf] with UnaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("level", DoubleType), StructField("variance", DoubleType),
    StructField("gain", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kalman_exact"

  override def createAggregationBuffer(): KalmanExact.Buf =
    new KalmanExact.Buf(false, 0.0, 0.0, 0.0)

  override def update(b: KalmanExact.Buf, input: InternalRow): KalmanExact.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val y = v.asInstanceOf[Double]
      if (b.set) {
        val pPred = b.p + q
        val k = pPred / (pPred + r)
        b.m = b.m + k * (y - b.m)
        b.p = (1.0 - k) * pPred
        b.k = k
      } else {
        b.m = y
        b.p = p0
        b.k = 1.0
        b.set = true
      }
    }
    b
  }

  override def merge(b: KalmanExact.Buf, other: KalmanExact.Buf): KalmanExact.Buf =
    throw new UnsupportedOperationException(
      "graft_kalman_exact is a window-only aggregate: the level/variance " +
        "recursion cannot be merged from partial aggregates; use it over " +
        "a running window frame")

  override def eval(b: KalmanExact.Buf): Any =
    if (b.set) new GenericInternalRow(Array[Any](b.m, b.p, b.k)) else null

  override def serialize(b: KalmanExact.Buf): Array[Byte] = {
    val buf = ByteBuffer.allocate(25)
    buf.put(if (b.set) 1.toByte else 0.toByte)
    buf.putDouble(b.m)
    buf.putDouble(b.p)
    buf.putDouble(b.k)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): KalmanExact.Buf = {
    val buf = ByteBuffer.wrap(bytes)
    new KalmanExact.Buf(buf.get() == 1.toByte, buf.getDouble(), buf.getDouble(),
      buf.getDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KalmanExact =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KalmanExact =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KalmanExact =
    copy(child = newChild)
}

object KalmanExact {
  /** level, error variance, last gain per series + an initialized flag. */
  final class Buf(var set: Boolean, var m: Double, var p: Double, var k: Double)
}
