package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream product analytics: funnels, retention cohorts, sliding
  * active users, inter-arrival statistics. All exact-integer relational
  * plans (counts, selected timestamps, fixed IEEE assembly for the few
  * terminal ratios) — deterministic on any engine and any partitioning.
  *
  * Reference scope note: tempo has no product-analytics surface; these are
  * the event-table companions a pipeline runs next to its time-series ops.
  */
object Analytics {

  /** Ordered funnel: for each user, the earliest strictly-increasing
    * completion chain through `steps` — t1 = first step-1 event, t2 =
    * first step-2 event AFTER t1, … (the standard "re-anchored" funnel:
    * later steps only count after the previous step completed). `depth` =
    * number of steps reached. Selected timestamps only ⇒ engine-exact.
    *
    * Plan shape: one tiny per-step aggregate + equi-join per step, all
    * keyed on the user — k−1 joins over shrinking sets, each map-side
    * combinable; the event table streams through once per step with the
    * step filter pushed to the scan. Output: (user, t1_us…tk_us, depth). */
  def funnel(df: DataFrame, tsCol: String, userCol: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val tsUs = unix_micros(col(tsCol))
    val first = df.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(tsUs).alias("t1_us"))
    val chained = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (prev, (step, i)) =>
        val tPrev = s"t${i}_us"
        val tCur = s"t${i + 1}_us"
        val nxt = df.filter(col(typeCol) === step)
          .select(col(userCol), tsUs.alias("__ts"))
          .join(prev.select(col(userCol), col(tPrev)), Seq(userCol))
          .filter(col("__ts") > col(tPrev))
          .groupBy(col(userCol)).agg(min(col("__ts")).alias(tCur))
        prev.join(nxt.select(col(userCol), col(tCur)), Seq(userCol), "left")
    }
    val depth = steps.indices.map(i => when(col(s"t${i + 1}_us").isNotNull, 1L)
      .otherwise(0L)).reduce(_ + _)
    chained.withColumn("depth", depth)
  }

  /** Retention cohorts: users bucketed by their FIRST active period
    * (period = `periodDays`-day windows from the epoch, exact integer
    * µs arithmetic — no calendar/ISO-week conventions to diverge on);
    * for offset k, retention = active users of the cohort in period
    * cohort+k over the cohort size (one terminal division). Output one
    * row per (cohort_period, k): (cohort_period, k, n_active,
    * cohort_size, retention). */
  def retentionCohorts(df: DataFrame, tsCol: String, userCol: String,
      periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, "periodDays must be >= 1")
    val periodUs = periodDays * 86400000000L
    val active = df.select(col(userCol),
      expr(s"unix_micros($tsCol) div $periodUs").alias("__p")).distinct()
    val cohorts = active.groupBy(col(userCol))
      .agg(min(col("__p")).alias("cohort_period"))
    val sizes = cohorts.groupBy(col("cohort_period"))
      .agg(count(lit(1)).alias("cohort_size"))
    active.join(cohorts, Seq(userCol))
      .groupBy(col("cohort_period"),
        (col("__p") - col("cohort_period")).alias("k"))
      .agg(count(lit(1)).alias("n_active"))
      .join(sizes, Seq("cohort_period"))
      .select(col("cohort_period"), col("k"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast(DoubleType) / col("cohort_size"))
          .alias("retention"))
  }

  /** Sliding active users: for every observed day, the distinct users
    * active in the trailing `windowDays` window (WAU at 7, MAU at 30).
    * Exact distinct via the day-explode decomposition: each (user, day)
    * activity contributes to `windowDays` report days, then one distinct +
    * count per report day — linear × windowDays, no sliding-window state,
    * embarrassing to parallelize at any corpus size. Report days are
    * clipped to the observed [min, max] span (one-row broadcast).
    * Output: (day_idx, day_ts_us, active_users). */
  def slidingActiveUsers(df: DataFrame, tsCol: String, userCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val dayUs = 86400000000L
    val days = df.select(col(userCol),
      expr(s"unix_micros($tsCol) div $dayUs").alias("__d")).distinct()
    val span = days.agg(min(col("__d")).alias("__lo"),
      max(col("__d")).alias("__hi"))
    days
      .withColumn("day_idx",
        explode(sequence(col("__d"), col("__d") + (windowDays - 1))))
      .select(col(userCol), col("day_idx")).distinct()
      .crossJoin(broadcast(span))
      .filter(col("day_idx") <= col("__hi"))
      .groupBy(col("day_idx"))
      .agg(count(lit(1)).alias("active_users"))
      .select(col("day_idx"), (col("day_idx") * dayUs).alias("day_ts_us"),
        col("active_users"))
  }

  /** Inter-arrival statistics per series: gap count, mean gap, and the
    * coefficient of variation (burstiness gauge: CV ≈ 1 Poisson, ≫ 1
    * bursty). Gaps quantize to whole SECONDS (integer µs difference
    * div 10⁶) so Σgap² stays far inside BIGINT range at any series
    * length; mean/sd/cv assemble from the exact sums in fixed IEEE order
    * (sample stddev, the [[Stats]] moment-sum discipline — sqrt is
    * correctly-rounded, so the result replays bit-for-bit). ONE series
    * exchange (lag window + aggregate share the sort). Output per series:
    * (series…, n_gaps, mean_gap_s, cv_gap). */
  def interArrival(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      tieCols: Seq[String] = Nil): DataFrame = {
    val sc = seriesCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sc: _*).orderBy((tsCol +: tieCols).map(col): _*)
    val tsUs = unix_micros(col(tsCol))
    val gap = ((tsUs - lag(tsUs, 1).over(w)) / 1000000L).cast(LongType)
    val agg = df.withColumn("__g", gap)
      .groupBy(sc: _*)
      .agg(count(col("__g")).alias("n_gaps"),
        sum(col("__g")).alias("__s1"),
        sum(col("__g") * col("__g")).alias("__s2"))
    val n = col("n_gaps")
    val mean = col("__s1").cast(DoubleType) / n
    val sd = sqrt((n * col("__s2") - col("__s1") * col("__s1"))
      .cast(DoubleType) / (n * (n - 1)))
    agg.select(sc ++ Seq(n,
      when(n > 0, mean).alias("mean_gap_s"),
      when(n > 1 && mean =!= 0.0, sd / mean).alias("cv_gap")): _*)
  }
}
