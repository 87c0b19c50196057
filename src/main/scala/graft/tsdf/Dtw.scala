package graft.tsdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dynamic time warping over integer activity profiles — ELASTIC
  * time-series similarity, where a shifted or locally stretched pattern
  * still scores as close (Euclidean distance scores a one-bucket shift of
  * a spike as maximally far; DTW warps the alignment and scores it 0).
  * The classic use here: comparing per-series behavioral shapes (hour-of-
  * day activity profiles) for cohorting, anomaly triage, and near-dup
  * detection of bot-like traffic.
  *
  * The whole DP runs as ONE nested higher-order-function fold per pair —
  * a pure Column expression, no UDF, no shuffle of its own: for profiles
  * of length n and m it folds `a` (outer) carrying the previous DP row as
  * an array accumulator and rebuilds each row with an inner fold over
  * `b`. All-integer arithmetic (profiles are exact cent/count sums), so
  * the distance is bit-reproducible in any engine with the same fold —
  * the DuckDB oracle replays it as the identical nested `list_reduce`.
  *
  * Scale shape: DTW cost lives entirely inside the projection — O(n·m)
  * arithmetic per pair with n, m = PROFILE length (a few dozen buckets),
  * not series length; the heavy reduction from raw events to profiles is
  * one map-side-combinable aggregate. Pairing is the caller's choice: a
  * bounded anchor set joins directly (the q_ann_topk ground-truth
  * convention); corpus-scale all-pairs goes through an LSH/banding
  * candidate stage first, exactly like the text near-dup family — never
  * a blind cross join. */
object Dtw {

  /** Large-but-safe boundary sentinel: dominates any real warp path (path
    * cost ≤ (n+m) · max|aᵢ−bⱼ|) while leaving headroom so `Inf + cost`
    * cannot overflow a BIGINT inside the fold. */
  val Inf: Long = 1000000000000000L

  /** DTW distance between two `array<bigint>` profiles as a single Column
    * expression (see object doc). Standard unit-cost grid: cost(i,j) =
    * |aᵢ − bⱼ|, moves ∈ {match, insert, delete}, dp(0,0) = 0 with `Inf`
    * borders, result = dp(n,m). */
  def dtwDistance(a: Column, b: Column): Column = {
    val aL = transform(a, _.cast(LongType))
    val bL = transform(b, _.cast(LongType))
    // row0 = [0, Inf, Inf, ...] with length m+1, derived from b itself so
    // no fixed-length parameter is needed
    val row0 = concat(array(lit(0L)), transform(bL, _ => lit(Inf)))
    aggregate(
      aL,
      row0,
      (prev, ai) =>
        aggregate(
          bL,
          array(lit(Inf)),
          (cur, bj) => concat(cur, array(
            abs(ai - bj) + least(
              element_at(prev, size(cur) + 1), // dp(i-1, j)
              element_at(prev, size(cur)),     // dp(i-1, j-1)
              element_at(cur, lit(-1)))))),    // dp(i,   j-1)
      row => element_at(row, lit(-1)))
  }

  /** Per-series hour-of-day activity profile: a 24-slot `array<bigint>`
    * of exact integer sums of `valueCol` per hour (empty hours = 0) — the
    * behavioral shape DTW compares. One map-side-combinable aggregate per
    * (series, hour), then one per series; the map lookup makes slot order
    * independent of `collect_list`'s arrival order. */
  def hourOfDayProfiles(df: DataFrame, seriesCol: String, tsCol: Column,
      valueCol: Column): DataFrame = {
    val hours = df
      .groupBy(col(seriesCol), hour(tsCol).cast(LongType).alias("__h"))
      .agg(sum(valueCol).cast(LongType).alias("__s"))
    profilesFromHourSums(hours, seriesCol, col("__h"), col("__s"))
  }

  /** Assemble the 24-slot profile array from already-grouped
    * (series, hour, sum) rows — the shape a folded streaming
    * [[graft.streaming.StreamingTSDF.sumDeltas]] sink arrives in. */
  def profilesFromHourSums(df: DataFrame, seriesCol: String, hourCol: Column,
      sumCol: Column): DataFrame = {
    df.groupBy(col(seriesCol))
      .agg(map_from_entries(collect_list(struct(
        hourCol.cast(LongType), sumCol.cast(LongType)))).alias("__m"))
      .select(col(seriesCol),
        transform(sequence(lit(0L), lit(23L)),
          h => coalesce(element_at(col("__m"), h), lit(0L)))
          .alias("profile"))
  }
}
