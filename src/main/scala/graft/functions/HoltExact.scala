package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** Exact Holt double-exponential smoothing (level + trend) as a window
  * aggregate:
  *
  *   l_0 = x_0,  b_0 = 0
  *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  *
  * The trend-aware cousin of [[EmaExact]]: where a plain EMA lags a ramping
  * series by (1−α)/α steps forever, Holt's trend term closes the gap. Used
  * over a running frame (unbounded preceding → current row); Spark updates
  * the buffer once per row and evaluates after each update — one pass per
  * series, two doubles of state. The recursion is inherently sequential, so
  * partial-aggregate merge is unsupported by construction and the
  * expression is window-only; [[graft.tsdf.Stats.holtExact]] applies the
  * window. Emits a (level, trend) struct; with exact binary α/β (e.g. 0.5,
  * 0.25) every step is a fixed-order IEEE expression, so a recursive-CTE
  * replay matches bit-for-bit. Null inputs keep the running state.
  *
  * Reference scope note: tempo has no Holt smoother — this extends its
  * `ema` family (/root/reference/python/tempo/tsdf.py:1044-1071). */
case class HoltExact(
    child: Expression,
    alpha: Double,
    beta: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HoltExact.Buf] with UnaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("level", DoubleType), StructField("trend", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_holt_exact"

  override def createAggregationBuffer(): HoltExact.Buf =
    new HoltExact.Buf(false, 0.0, 0.0)

  override def update(b: HoltExact.Buf, input: InternalRow): HoltExact.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (b.set) {
        val newLevel = alpha * x + (1 - alpha) * (b.level + b.trend)
        b.trend = beta * (newLevel - b.level) + (1 - beta) * b.trend
        b.level = newLevel
      } else {
        b.level = x
        b.trend = 0.0
        b.set = true
      }
    }
    b
  }

  override def merge(b: HoltExact.Buf, other: HoltExact.Buf): HoltExact.Buf =
    throw new UnsupportedOperationException(
      "graft_holt_exact is a window-only aggregate: the level/trend " +
        "recursion cannot be merged from partial aggregates; use it over " +
        "a running window frame")

  override def eval(b: HoltExact.Buf): Any =
    if (b.set) new GenericInternalRow(Array[Any](b.level, b.trend)) else null

  override def serialize(b: HoltExact.Buf): Array[Byte] = {
    val buf = ByteBuffer.allocate(17)
    buf.put(if (b.set) 1.toByte else 0.toByte)
    buf.putDouble(b.level)
    buf.putDouble(b.trend)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): HoltExact.Buf = {
    val buf = ByteBuffer.wrap(bytes)
    new HoltExact.Buf(buf.get() == 1.toByte, buf.getDouble(), buf.getDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HoltExact =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HoltExact =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): HoltExact =
    copy(child = newChild)
}

object HoltExact {
  /** Two doubles of state per series + an initialized flag. */
  final class Buf(var set: Boolean, var level: Double, var trend: Double)
}
