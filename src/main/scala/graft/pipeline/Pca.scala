package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.GramMatrixAgg
import org.apache.spark.sql.GraftColumns

/** PCA over a fixed-dim embedding column, the 100 TB way: ONE corpus pass
  * accumulates the exact integer second-moment matrix through
  * [[graft.functions.GramMatrixAgg]] (a ~16 KiB mergeable buffer per
  * partition — no dim²-exploded shuffle), the bounded (dim+1)² matrix
  * collects to the driver (the ANN-codebook bounded-literal discipline),
  * a dim×dim Jacobi eigensolve runs driver-side in milliseconds, and the
  * projection goes back to the executors as a pure Column literal — the
  * corpus is touched exactly twice (train scan + project scan), never
  * shuffled.
  *
  * The augmented-vector trick: training appends a constant 1 to every
  * vector, so one Gram aggregate yields Σvᵢvⱼ, the coordinate sums Σvᵢ
  * (cross terms with the 1) and the row count n (the 1·1 cell) — means and
  * covariance come out of a single pass with no second aggregate.
  *
  * Inputs are expected integer-valued (milli-quantized) so the Gram sums
  * are exact BIGINTs; the eigensolve itself is driver-side IEEE arithmetic
  * (deterministic for a given gram matrix — same doubles on every run, any
  * cluster; eigenvector SIGN is pinned by making each vector's
  * largest-magnitude coordinate positive). */
object Pca {

  /** Exact integer upper-triangle Gram rows: (i, j, n, s) with
    * s = Σ rows vᵢ·vⱼ, i ≤ j, i/j 0-based — the oracle-checkable face of
    * the one-pass trainer. */
  def gramMatrix(df: DataFrame, vecCol: Column, dim: Int): DataFrame = {
    val asLongs = transform(vecCol, x => x.cast(LongType))
    val g = GraftColumns.column(
      GramMatrixAgg(GraftColumns.expression(asLongs), dim))
    val pairs = for { i <- 0 until dim; j <- i until dim } yield (i, j)
    val iLit = typedLit(pairs.map(_._1.toLong))
    val jLit = typedLit(pairs.map(_._2.toLong))
    df.agg(g.alias("__g"), count(lit(1)).alias("n"))
      .select(col("n"), posexplode(col("__g")).as(Seq("__k", "s")))
      .select(
        element_at(iLit, col("__k").cast(IntegerType) + 1).alias("i"),
        element_at(jLit, col("__k").cast(IntegerType) + 1).alias("j"),
        col("n"), col("s"))
  }

  /** Trained model: per-coordinate means and the top-d components (rows =
    * components, orthonormal, variance-descending). */
  final case class PcaModel(means: Seq[Double], components: Seq[Seq[Double]],
      eigenvalues: Seq[Double])

  /** One-pass PCA train (see object doc). `d` = number of components. */
  def train(df: DataFrame, vecCol: Column, dim: Int, d: Int): PcaModel = {
    require(d >= 1 && d <= dim, s"need 1 <= d <= dim, got $d")
    val aug = concat(transform(vecCol, x => x.cast(LongType)),
      array(lit(1L)))
    val g = GraftColumns.column(
      GramMatrixAgg(GraftColumns.expression(aug), dim + 1))
    val packed = df.agg(g.alias("g")).collect().head
      .getSeq[Long](0).toArray
    // unpack upper triangle of the (dim+1)² augmented matrix
    val m = dim + 1
    val full = Array.ofDim[Double](m, m)
    var k = 0
    for (i <- 0 until m; j <- i until m) {
      full(i)(j) = packed(k).toDouble; full(j)(i) = packed(k).toDouble
      k += 1
    }
    val n = full(dim)(dim) // the 1·1 cell counts rows
    require(n >= 2, s"need at least 2 rows, got $n")
    val means = (0 until dim).map(i => full(i)(dim) / n)
    // covariance: C_ij = S2_ij/n − mean_i·mean_j
    val cov = Array.tabulate(dim, dim)((i, j) =>
      full(i)(j) / n - means(i) * means(j))
    val (vals, vecs) = jacobiEigen(cov)
    val order = vals.indices.sortBy(i => -vals(i)).take(d)
    val comps = order.map { ci =>
      val v = (0 until dim).map(r => vecs(r)(ci))
      // sign pin: largest-|coordinate| positive
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) v.map(-_) else v
    }
    PcaModel(means, comps, order.map(vals))
  }

  /** Project the vector column onto the model's components: output columns
    * `pc0..pc{d-1}` appended — pure Column algebra over broadcast-free
    * literals, zero shuffle. */
  def project(df: DataFrame, vecCol: Column, model: PcaModel): DataFrame = {
    val meansLit = typedLit(model.means)
    model.components.zipWithIndex.foldLeft(df) { case (acc, (comp, ci)) =>
      val compLit = typedLit(comp)
      val centered = zip_with(vecCol, meansLit, (x, mu) => x.cast("double") - mu)
      acc.withColumn(s"pc$ci",
        aggregate(zip_with(centered, compLit, (x, w) => x * w),
          lit(0.0), (s, x) => s + x))
    }
  }

  /** PCA whitening: project onto the trained components and scale each
    * coordinate by 1/√eigenvalue, so the output has identity covariance
    * under the trained model — the standard embedding-preprocessing step
    * before cosine retrieval, clustering, or contrastive training
    * (dominant directions stop drowning out the tail). Same
    * literal-projection plan as [[project]] (one scan, zero shuffles,
    * model ships as Column literals); the scale is ONE terminal
    * correctly-rounded IEEE division per coordinate against a
    * driver-computed √λ literal, so a replay given the same trained
    * literals stays bit-exact. Emits `wc0..wcD-1` alongside the input
    * columns. */
  def whiten(df: DataFrame, vecCol: Column, model: PcaModel): DataFrame = {
    val projected = project(df, vecCol, model)
    model.eigenvalues.indices.foldLeft(projected) { case (acc, ci) =>
      acc.withColumn(s"wc$ci",
        col(s"pc$ci") / math.sqrt(model.eigenvalues(ci)))
    }
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvectors as COLUMNS). O(dim³) per sweep, a handful
    * of sweeps to converge — milliseconds at embedding dims, driver-side
    * on a matrix that is bounded by construction. */
  private[pipeline] def jacobiEigen(a0: Array[Array[Double]])
      : (IndexedSeq[Double], Array[Array[Double]]) = {
    val nDim = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(nDim, nDim)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 * (1.0 + frobenius(a)) && sweep < 64) {
      for (p <- 0 until nDim - 1; q <- p + 1 until nDim if a(p)(q) != 0.0) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
            case 0.0 => 1.0 // theta == 0 -> 45° rotation
            case x => x
          }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (i <- 0 until nDim) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (i <- 0 until nDim) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi
          a(q)(i) = s * api + c * aqi
        }
        for (i <- 0 until nDim) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
      off = offDiag(a)
      sweep += 1
    }
    ((0 until nDim).map(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
}
