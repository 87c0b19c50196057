package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** Exact additive Holt-Winters triple-exponential smoothing (level + trend
  * + season of length m) as a window aggregate:
  *
  *   warm-up (first m observations): emit null, accumulate x₁…x_m
  *   at t = m:  l = (x₁+…+x_m)/m  (left-to-right sum),  b = 0,
  *              s_i = x_i − l  — still emits null
  *   for t > m: l_t = α·(x_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
  *              b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  *              s_t = γ·(x_t − l_t) + (1−γ)·s_{t−m}
  *
  * The seasonal ring is kept ROTATED (head = the factor the next
  * observation consumes), so each step is `head-use, tail :+ new` — the
  * same representation a recursive-CTE replay uses (`sl[2:] || [s_new]`),
  * which keeps the oracle bit-identical without positional list writes.
  * Like [[HoltExact]], the recursion is inherently sequential: window-only,
  * partial-aggregate merge unsupported by construction. Null inputs keep
  * the state AND the seasonal phase (they are skipped, not zero-filled).
  * With exact binary α/β/γ (0.5, 0.25, 0.5) every step is a fixed-order
  * IEEE expression. Emits a (level, trend, seasonal) struct, null through
  * the warm-up season.
  *
  * Reference scope note: tempo has no seasonal smoother — this completes
  * its `ema` family (/root/reference/python/tempo/tsdf.py:1044-1071)
  * through Holt to Holt-Winters. */
case class HoltWintersExact(
    child: Expression,
    alpha: Double,
    beta: Double,
    gamma: Double,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HoltWintersExact.Buf]
  with UnaryLike[Expression] {

  require(m >= 2, "season length m must be >= 2")

  override def dataType: DataType = StructType(Seq(
    StructField("level", DoubleType), StructField("trend", DoubleType),
    StructField("seasonal", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_holt_winters_exact"

  override def createAggregationBuffer(): HoltWintersExact.Buf =
    new HoltWintersExact.Buf(0, 0.0, 0.0, 0.0, Vector.empty)

  override def update(b: HoltWintersExact.Buf,
      input: InternalRow): HoltWintersExact.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      b.cnt += 1
      if (b.cnt < m) {
        b.warmSum += x
        b.ring = b.ring :+ x // warm values, chronological
      } else if (b.cnt == m) {
        b.warmSum += x
        val level = b.warmSum / m
        b.ring = (b.ring :+ x).map(w => w - level) // head = next to consume
        b.level = level
        b.trend = 0.0
      } else {
        val sPrev = b.ring.head
        val newLevel = alpha * (x - sPrev) + (1 - alpha) * (b.level + b.trend)
        b.trend = beta * (newLevel - b.level) + (1 - beta) * b.trend
        b.level = newLevel
        val sNew = gamma * (x - newLevel) + (1 - gamma) * sPrev
        b.ring = b.ring.tail :+ sNew
      }
    }
    b
  }

  override def merge(b: HoltWintersExact.Buf,
      other: HoltWintersExact.Buf): HoltWintersExact.Buf =
    throw new UnsupportedOperationException(
      "graft_holt_winters_exact is a window-only aggregate: the " +
        "level/trend/seasonal recursion cannot be merged from partial " +
        "aggregates; use it over a running window frame")

  override def eval(b: HoltWintersExact.Buf): Any =
    if (b.cnt > m)
      new GenericInternalRow(Array[Any](b.level, b.trend, b.ring.last))
    else null

  override def serialize(b: HoltWintersExact.Buf): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * 3 + 4 + 8 * b.ring.size)
    buf.putInt(b.cnt)
    buf.putDouble(b.warmSum)
    buf.putDouble(b.level)
    buf.putDouble(b.trend)
    buf.putInt(b.ring.size)
    b.ring.foreach(buf.putDouble)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): HoltWintersExact.Buf = {
    val buf = ByteBuffer.wrap(bytes)
    val cnt = buf.getInt()
    val warmSum = buf.getDouble()
    val level = buf.getDouble()
    val trend = buf.getDouble()
    val n = buf.getInt()
    val ring = Vector.fill(n)(buf.getDouble())
    new HoltWintersExact.Buf(cnt, warmSum, level, trend, ring)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HoltWintersExact =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HoltWintersExact =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(
      newChild: Expression): HoltWintersExact =
    copy(child = newChild)
}

object HoltWintersExact {
  /** Warm-up count/sum, level, trend, and the rotated seasonal ring
    * (during warm-up: the raw values seen so far). */
  final class Buf(var cnt: Int, var warmSum: Double, var level: Double,
      var trend: Double, var ring: Vector[Double])
}
