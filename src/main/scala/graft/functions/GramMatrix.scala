package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer Gram matrix (Σ vᵢ·vⱼ over all rows) of a fixed-dim
  * array<long> vector column, packed as the upper triangle in row-major
  * order (k runs over i ≤ j).
  *
  * This is the covariance/PCA trainer's one corpus pass done the way 100 TB
  * requires: the aggregation state is ONE long[dim·(dim+1)/2] buffer
  * (~16 KiB at dim = 64) per partition, `merge` is an element-wise add —
  * fully partial-aggregable, so every input partition collapses map-side
  * and the shuffle carries one buffer per partition instead of the
  * dim²-exploded row stream a groupBy-over-(i,j) formulation would emit
  * (×2080 shuffle amplification at dim = 64). Exact BIGINT sums: with
  * milli-quantized inputs |v| ≤ 10³ the products are ≤ 10⁶ per row, safe to
  * ~9·10¹² rows before 2^63 (caller-owned bound, the
  * [[graft.pipeline.Profile.pairwiseCorrelation]] discipline).
  *
  * Null vectors are skipped; a vector of the wrong length fails fast (a
  * silent truncation would corrupt every later eigensolve). Null ELEMENTS
  * are rejected the same way — the trainer's contract is dense vectors.
  */
case class GramMatrixAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(dim >= 1, "dim must be >= 1")
  private val len = dim * (dim + 1) / 2

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram_matrix"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != dim)
        throw new IllegalArgumentException(
          s"graft_gram_matrix(dim=$dim) got a vector of length ${arr.numElements()}")
      val xs = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"graft_gram_matrix: null element at position $i")
        xs(i) = arr.getLong(i)
        i += 1
      }
      var k = 0
      i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          b(k) += xs(i) * xs(j)
          k += 1; j += 1
        }
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < len) { b(k) += other(k); k += 1 }
    b
  }

  override def eval(b: Array[Long]): Any =
    new GenericArrayData(b.map(Long.box))

  override def serialize(b: Array[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 * len)
    var k = 0
    while (k < len) { buf.putLong(b(k)); k += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new Array[Long](len)
    var k = 0
    while (k < len) { b(k) = buf.getLong(); k += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): GramMatrixAgg =
    copy(child = newChild)
}
