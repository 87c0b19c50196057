package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exact exponential-moving-average recursion as a window aggregate:
  * ema_0 = x_0, ema_t = α·x_t + (1−α)·ema_{t−1}.
  *
  * Used over a running frame (unbounded preceding → current row), where
  * Spark updates the buffer once per row and evaluates after each update —
  * one pass per series, one double of state, the exact batch twin of
  * [[graft.streaming.StreamingTSDF.ema]]'s per-series recursion (same IEEE
  * ops in the same order, so the two are bit-identical on the same data).
  * The reference's `ema` is a truncated-lag approximation
  * (/root/reference/python/tempo/tsdf.py:1044-1071); this is the exact
  * complement. Partial-aggregation merge is unsupported by construction —
  * an EMA prefix cannot be combined from two halves — so the expression is
  * window-only; [[graft.tsdf.Stats.emaExact]] applies the window.
  *
  * Null inputs keep the running state (and emit the current EMA), matching
  * "no observation" semantics rather than poisoning the tail of the series.
  */
case class EmaExact(
    child: Expression,
    alpha: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[EmaExact.Buf] with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ema_exact"

  override def createAggregationBuffer(): EmaExact.Buf = new EmaExact.Buf(false, 0.0)

  override def update(b: EmaExact.Buf, input: InternalRow): EmaExact.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      b.ema = if (b.set) alpha * x + (1 - alpha) * b.ema else x
      b.set = true
    }
    b
  }

  override def merge(b: EmaExact.Buf, other: EmaExact.Buf): EmaExact.Buf =
    throw new UnsupportedOperationException(
      "graft_ema_exact is a window-only aggregate: an EMA cannot be merged " +
        "from partial aggregates; use it over a running window frame")

  override def eval(b: EmaExact.Buf): Any = if (b.set) b.ema else null

  override def serialize(b: EmaExact.Buf): Array[Byte] = {
    val buf = ByteBuffer.allocate(9)
    buf.put(if (b.set) 1.toByte else 0.toByte)
    buf.putDouble(b.ema)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): EmaExact.Buf = {
    val buf = ByteBuffer.wrap(bytes)
    new EmaExact.Buf(buf.get() == 1.toByte, buf.getDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): EmaExact =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): EmaExact =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): EmaExact =
    copy(child = newChild)
}

object EmaExact {
  /** One double of state per series + an initialized flag. */
  final class Buf(var set: Boolean, var ema: Double)
}
