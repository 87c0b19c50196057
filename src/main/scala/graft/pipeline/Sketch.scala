package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic cardinality sketches.
  *
  * KMV (k-minimum-values): keep the k smallest distinct hash values of a
  * set; with a hash uniform on [0, P), the k-th smallest value h_(k)
  * estimates the distinct count as (k−1)·P / h_(k). Groups with fewer than
  * k distinct hashes report their EXACT count (the sketch degrades to
  * nothing — no estimate error on small groups). Everything runs on
  * [[Hashing]]'s engine-agnostic polynomial hash, so the sketch — including
  * the estimate's single double division — replays bit-identically in any
  * engine; unlike HyperLogLog there is no register rounding, no bias
  * correction table, and the k-th-minimum is a pure function of the value
  * set.
  *
  * Plan shape: one distinct on (group, hash) — the only full-volume
  * shuffle, map-side combined — then a rank window per group over the
  * (far smaller) distinct hashes. Collision caveat: the 30-bit hash space
  * caps resolvable cardinality around ~P; per-group distinct counts
  * should stay well below that (the oracle gate needs the same hash on
  * both sides, which rules out a 64-bit space — documented trade).
  *
  * Reference scope note: tempo has no sketches; this serves the pipeline
  * side (e.g. distinct-token profiling per source over a 100 TB corpus,
  * where exact count-distinct is a full re-shuffle of every token). */
object Sketch {

  /** Per-group KMV distinct-count estimate of `itemCol` values.
    * Output: group cols + (n_kept ≤ k, kth_hash, distinct_est). */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], itemCol: Column,
      k: Int, seed: Int = 17): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val gc = groupCols.map(col)
    val hashed = df
      .select(gc :+ Hashing.mix(Hashing.polyHash(itemCol), seed).alias("__h"): _*)
      .distinct()
    val w = Window.partitionBy(gc: _*).orderBy(col("__h"))
    val ranked = hashed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
    ranked.groupBy(gc: _*)
      .agg(count(lit(1)).alias("n_kept"), max(col("__h")).alias("kth_hash"))
      .select(gc ++ Seq(col("n_kept"), col("kth_hash"),
        when(col("n_kept") < k, col("n_kept").cast(DoubleType))
          .otherwise(lit((k - 1).toDouble * Hashing.P) / col("kth_hash"))
          .alias("distinct_est")): _*)
  }
}
