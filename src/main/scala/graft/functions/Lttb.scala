package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) — the
  * standard shape-preserving series reduction for plotting: keep first and
  * last point, split the middle into nOut−2 equal index buckets, and from
  * each bucket keep the point forming the largest triangle with the
  * previously KEPT point and the next bucket's centroid. Complements
  * [[graft.streaming.StreamingTSDF.downsampleMinMax]] (envelope-exact)
  * with the perceptual-shape variant.
  *
  * Determinism: inputs are (x = µs BIGINT, y = fixed-point BIGINT) pairs;
  * bucket assignment is pure integer arithmetic
  * (bucket(i) = (i−1)·(nOut−2) div (n−2)); centroids are exact integer
  * sums divided once; triangle areas are a FIXED IEEE op sequence; the
  * argmax uses strict >, so ties keep the earliest point. The identical
  * arithmetic replays as a recursive candidate-scan CTE in DuckDB (the
  * per-bucket argmax is sequential state — each selection feeds the next
  * bucket's areas — which SQL recursion expresses one candidate per step).
  *
  * Scale note: the per-series point list is buffered (selection is a
  * global sequential pass per series — the same bound as the exact
  * rolling frames; a series must fit a task). Series are independent, so
  * the operator distributes per series.
  */
object Lttb {

  /** Selected indices (ascending) of the LTTB sweep over (xs, ys) sorted
    * by x; n ≤ nOut or n ≤ 2 keeps everything. */
  def lttbIndices(xs: Array[Long], ys: Array[Long], nOut: Int): Array[Int] = {
    val n = xs.length
    if (n <= nOut || n <= 2) return Array.tabulate(n)(identity)
    val m = nOut - 2
    // starts(k) = first middle index of bucket k; starts(m) sentinels n-1
    val starts = new Array[Int](m + 1)
    starts(0) = 1
    var b = 0
    var i = 1
    while (i <= n - 2) {
      val k = ((i - 1).toLong * m / (n - 2)).toInt
      if (k > b) { b = k; starts(k) = i }
      i += 1
    }
    starts(m) = n - 1
    val out = new Array[Int](nOut)
    out(0) = 0
    var prev = 0
    var k = 0
    while (k < m) {
      var ax = 0.0
      var ay = 0.0
      if (k < m - 1) {
        var sx = 0L; var sy = 0L; var c = 0L
        var j = starts(k + 1)
        val hj = starts(k + 2)
        while (j < hj) { sx += xs(j); sy += ys(j); c += 1; j += 1 }
        ax = sx.toDouble / c.toDouble
        ay = sy.toDouble / c.toDouble
      } else {
        ax = xs(n - 1).toDouble
        ay = ys(n - 1).toDouble
      }
      val xp = xs(prev).toDouble
      val yp = ys(prev).toDouble
      var best = starts(k)
      var besta = -1.0
      var j = starts(k)
      val hi = starts(k + 1)
      while (j < hi) {
        val a1 = (xp - ax) * (ys(j).toDouble - yp)
        val a2 = (xp - xs(j).toDouble) * (ay - yp)
        val area = math.abs(a1 - a2)
        if (area > besta) { besta = area; best = j }
        j += 1
      }
      out(k + 1) = best
      prev = best
      k += 1
    }
    out(nOut - 1) = n - 1
    out
  }
}

/** Array expression form: array<struct<x: bigint, y: bigint>> (sorted by
  * x) → the LTTB-selected subarray. Eval-only (runs once per series, not
  * per row — not a codegen hot path). */
case class LttbSelect(child: Expression, nOut: Int)
    extends UnaryExpression with CodegenFallback {
  require(nOut >= 3, s"lttb nOut must be >= 3, got $nOut")

  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_lttb"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull arrays are rejected at ANALYSIS time: a null element
    // would otherwise surface as an eval-time NullPointerException from
    // getStruct (collect_list-built arrays — the intended producer — are
    // containsNull = false, so this costs legitimate callers nothing)
    case ArrayType(StructType(Array(a, b)), false)
        if a.dataType == LongType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint, bigint>> without null " +
        s"elements, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val xs = new Array[Long](n)
    val ys = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = arr.getStruct(i, 2)
      xs(i) = r.getLong(0)
      ys(i) = r.getLong(1)
      i += 1
    }
    val idx = Lttb.lttbIndices(xs, ys, nOut)
    new GenericArrayData(
      idx.map(j => arr.getStruct(j, 2).copy().asInstanceOf[Any]))
  }

  override protected def withNewChildInternal(newChild: Expression): LttbSelect =
    copy(child = newChild)
}
