package graft.tsdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Resample pre-flight diagnostics: how many buckets would a resample at
  * `freq` produce per series, and how does that distribute across series.
  *
  * Reference: `calculate_time_horizon`
  * (/root/reference/python/tempo/utils.py:53-136) — emitted there as a
  * warning string; here the same numbers are returned as DataFrames so they
  * compose (and so the per-series form can be correctness-gated).
  */
object TimeHorizon {

  /** Per-series horizon: min/max ts, actual row count, and the expected
    * bucket count `num_values` — the reference's formula on bucket-rounded
    * epoch millis: (round(max) − round(min)) / interval + 1. */
  def perSeries(tsdf: TSDF, freq: String): DataFrame = {
    val spec = Resample.parseFreq(freq)
    val intervalMs = math.max(spec.micros / 1000L, 1L) // reference works in ms
    tsdf.df
      .groupBy(tsdf.seriesCols: _*)
      .agg(min(tsdf.ts).alias("min_ts"), max(tsdf.ts).alias("max_ts"),
        count(lit(1)).alias("actual_rows"))
      .withColumn("__min_ms", unix_millis(col("min_ts")))
      .withColumn("__max_ms", unix_millis(col("max_ts")))
      .withColumn("__rmin", col("__min_ms") - pmod(col("__min_ms"), lit(intervalMs)))
      .withColumn("__rmax", col("__max_ms") - pmod(col("__max_ms"), lit(intervalMs)))
      .withColumn("num_values", (col("__rmax") - col("__rmin")) / lit(intervalMs) + 1)
      .drop("__min_ms", "__max_ms", "__rmin", "__rmax")
  }

  /** The global summary the reference prints as its ResampleWarning:
    * earliest/latest ts, series count, min/max/p25/p50/p75 of the per-series
    * expected bucket counts, and the total. One aggregation over
    * [[perSeries]]. */
  def summary(tsdf: TSDF, freq: String): DataFrame =
    perSeries(tsdf, freq).agg(
      min(col("min_ts")).alias("earliest_ts"),
      max(col("max_ts")).alias("latest_ts"),
      count(lit(1)).alias("n_series"),
      min(col("num_values")).alias("min_values"),
      max(col("num_values")).alias("max_values"),
      percentile_approx(col("num_values"), lit(0.25), lit(10000)).alias("p25_values"),
      percentile_approx(col("num_values"), lit(0.5), lit(10000)).alias("p50_values"),
      percentile_approx(col("num_values"), lit(0.75), lit(10000)).alias("p75_values"),
      sum(col("num_values")).alias("total_values"))
}
