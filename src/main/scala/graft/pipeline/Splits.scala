package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `randomSplit` is seed-dependent AND partitioning-dependent (a repartition
  * reshuffles the split); hashing a stable id is neither: every row lands in
  * the same split on every run, any cluster, any engine — which is what
  * train/val/test contracts need. Pure column algebra over the
  * engine-agnostic [[Hashing]] so the assignment replays in SQL oracles. */
object Splits {

  /** Split index in [0, weights.size) per row: the id hashes to a uniform
    * bucket in [0, total), and cumulative weight ranges carve the buckets.
    * Integer weights make the carve exact (e.g. 8/1/1 for 80/10/10). */
  def splitIndex(idCol: Column, weights: Seq[Int]): Column = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be positive")
    val total = weights.sum
    val bucket = pmod(Hashing.mix(Hashing.polyHash(idCol.cast("string")), 7), lit(total))
    val bounds = weights.scanLeft(0)(_ + _)
    // single CASE chain: bucket < bounds(i+1) picks split i; the last split
    // is the otherwise (bucket is always < total)
    (1 until weights.size - 1)
      .foldLeft(when(bucket < bounds(1), lit(0L))) { (acc, i) =>
        acc.when(bucket < bounds(i + 1), lit(i.toLong))
      }
      .otherwise(lit(weights.size.toLong - 1))
  }

  /** Tag every row with its `split` index (0-based, in weight order). */
  def assign(df: DataFrame, idCol: String, weights: Seq[Int],
      outCol: String = "split"): DataFrame =
    df.withColumn(outCol, splitIndex(col(idCol), weights))

  /** The rows of one split — `assign` + filter, for `df.transform` chains. */
  def take(df: DataFrame, idCol: String, weights: Seq[Int], idx: Int): DataFrame = {
    require(idx >= 0 && idx < weights.size, s"split $idx out of range")
    df.filter(splitIndex(col(idCol), weights) === idx.toLong)
  }

  /** Deterministic stratified sampling: keep a per-stratum fraction of rows
    * (e.g. language rebalancing — downsample English, keep all of a
    * low-resource stratum). The id hashes to a uniform bucket in
    * [0, `buckets`); a row survives iff its bucket clears the stratum's
    * integer threshold `round(fraction · buckets)` — pure integer compare,
    * no floats, so the SAME rows survive on any run, partitioning, or
    * engine (unlike `df.sample`, which is rng-and-partition dependent).
    * Strata missing from `fractions` get `defaultFraction`. One
    * zero-shuffle filter pass; the when-chain is a broadcast-free literal
    * lookup that stays inside codegen. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      seed: Int = 11, buckets: Int = 1000000): DataFrame = {
    require(buckets > 0)
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1))
    val bucket = pmod(
      Hashing.mix(Hashing.polyHash(col(idCol).cast("string")), seed), lit(buckets))
    def thr(f: Double): Long = math.round(f * buckets)
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft[Column](lit(thr(defaultFraction))) { case (acc, (s, f)) =>
        when(col(stratumCol) === s, lit(thr(f))).otherwise(acc)
      }
    df.filter(bucket < threshold)
  }
}
