package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Grouped multivariate least squares — the ml-lite "fit a plane per
  * group" pass (per-entity trend + seasonality coefficients, pricing
  * curves, per-source quality drift) without any ML-library dependency
  * or driver-side loop: ONE map-side-combinable aggregate of exact
  * integer moment sums per group, then the 3×3 normal equations solved
  * in closed form by Cramer's rule as a fixed-order Column expression.
  *
  * Determinism: inputs are integer-valued (the cents contract), so all
  * nine moment sums are exact BIGINTs — order-free; the determinants
  * and the three β divisions are a FIXED composition of IEEE ops on
  * those exact integers, hence bit-identical in any engine. A singular
  * system (a group whose feature matrix has no full rank — e.g. a
  * constant feature) yields null βs, never NaN.
  *
  * Scale: per-group state is 10 numbers regardless of group size; the
  * aggregate partial-combines in every input task (no window, no
  * per-group sort), and the solve is a projection. */
object Regression {

  /** OLS of `y` on (1, x1, x2) per group: exact moment sums + Cramer
    * βs. Output: groupCols ++ (n, sx1, sx2, sy, sx11, sx12, sx22,
    * sx1y, sx2y, beta0, beta1, beta2). */
  def groupOls2(df: DataFrame, groupCols: Seq[String], x1: Column,
      x2: Column, y: Column): DataFrame = {
    val base = df.select(
      groupCols.map(col) ++ Seq(x1.alias("__x1"), x2.alias("__x2"),
        y.alias("__y")): _*)
      .filter(col("__x1").isNotNull && col("__x2").isNotNull &&
        col("__y").isNotNull)
    val m = base.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).alias("n"),
      sum(col("__x1")).alias("sx1"),
      sum(col("__x2")).alias("sx2"),
      sum(col("__y")).alias("sy"),
      sum(col("__x1") * col("__x1")).alias("sx11"),
      sum(col("__x1") * col("__x2")).alias("sx12"),
      sum(col("__x2") * col("__x2")).alias("sx22"),
      sum(col("__x1") * col("__y")).alias("sx1y"),
      sum(col("__x2") * col("__y")).alias("sx2y"))
    olsFromMoments(m)
  }

  /** The Cramer solve over an already-aggregated moments table
    * (n, sx1, sx2, sy, sx11, sx12, sx22, sx1y, sx2y — the shape a
    * folded streaming [[graft.streaming.StreamingTSDF.olsMomentDeltas]]
    * sink arrives in): appends beta0/1/2. Moments are additive, so the
    * stream fold and the batch aggregate land on identical integers and
    * the pinned-order determinants match bit-for-bit. */
  def olsFromMoments(m: DataFrame): DataFrame = {
    def d(c: Column) = c.cast(DoubleType)
    // det of [[a b c][p q r][u v w]] in one pinned evaluation order
    def det3(a: Column, b: Column, c: Column, p: Column, q: Column,
        r: Column, u: Column, v: Column, w: Column): Column =
      a * (q * w - r * v) - b * (p * w - r * u) + c * (p * v - q * u)
    val (n, s1, s2, sy) = (d(col("n")), d(col("sx1")), d(col("sx2")),
      d(col("sy")))
    val (s11, s12, s22) = (d(col("sx11")), d(col("sx12")), d(col("sx22")))
    val (s1y, s2y) = (d(col("sx1y")), d(col("sx2y")))
    val detA = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    val det0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    val det1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    val det2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    m.withColumn("beta0", when(detA =!= 0.0, det0 / detA))
      .withColumn("beta1", when(detA =!= 0.0, det1 / detA))
      .withColumn("beta2", when(detA =!= 0.0, det2 / detA))
  }
}
