package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Distribution-drift measurement between two corpus cohorts — the
  * monitoring step of a training-data pipeline (did this month's crawl
  * shift against last month's? does the val split mirror train?).
  *
  * All comparisons are assembled from exact integer counts: the per-bucket
  * proportion difference |p_a − p_b| is computed as the cross-multiplied
  * |cnt_a·n_b − cnt_b·n_a| (an exact BIGINT — no per-bucket double
  * rounding and no order-dependent double accumulation), and only the final
  * scalar divisions are floating point, in one fixed operation order — so
  * results replay bit-for-bit in any engine. Exactness holds while cohort
  * sizes stay below ~3·10⁹ rows (cnt·n < 2⁶³); beyond that, swap the two
  * products to decimal(38,0).
  */
object Drift {

  /** Per-bucket histogram comparison of cohorts `a` and `b` over
    * `bucketCol`, plus the total-variation distance
    * TV = ½ Σ_buckets |p_a − p_b| (in [0, 1]; 0 = identical distributions,
    * 1 = disjoint support) repeated on every row.
    *
    * Plan shape: each cohort collapses to one partial+final count aggregate
    * keyed by bucket (the only data-sized work); everything after the full
    * outer join runs on #buckets rows, so the unpartitioned window totals
    * are a few-row, single-task step by construction. Buckets missing from
    * one cohort count as zero there.
    *
    * An empty cohort has no defined proportions: its `pa`/`pb` and the
    * `tv_distance` emit as null (guarded division), never NaN/Infinity.
    *
    * Output: (bucket, cnt_a, cnt_b, pa, pb, abs_diff_scaled =
    * |cnt_a·n_b − cnt_b·n_a|, tv_distance). */
  def histogramDrift(a: DataFrame, b: DataFrame, bucketCol: String): DataFrame = {
    val ca = a.groupBy(col(bucketCol)).agg(count(lit(1)).alias("cnt_a"))
    val cb = b.groupBy(col(bucketCol)).agg(count(lit(1)).alias("cnt_b"))
    val joined = ca.join(cb, Seq(bucketCol), "full_outer")
      .select(col(bucketCol),
        coalesce(col("cnt_a"), lit(0L)).alias("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).alias("cnt_b"))
    val wTot = Window.partitionBy() // #buckets rows — tiny by construction
    val staged = joined
      .withColumn("__na", sum(col("cnt_a")).over(wTot))
      .withColumn("__nb", sum(col("cnt_b")).over(wTot))
      .withColumn("__diff",
        abs(col("cnt_a") * col("__nb") - col("cnt_b") * col("__na")))
    staged
      .withColumn("__tvnum", sum(col("__diff")).over(wTot))
      .select(col(bucketCol),
        col("cnt_a"), col("cnt_b"),
        when(col("__na") > 0,
          col("cnt_a").cast(DoubleType) / col("__na")).alias("pa"),
        when(col("__nb") > 0,
          col("cnt_b").cast(DoubleType) / col("__nb")).alias("pb"),
        col("__diff").alias("abs_diff_scaled"),
        when(col("__na") > 0 && col("__nb") > 0,
          lit(0.5) * col("__tvnum").cast(DoubleType) /
            (col("__na") * col("__nb"))).alias("tv_distance"))
  }

  /** Chi-square homogeneity statistic + Hellinger affinity between cohorts
    * `a` and `b`, one row per bucket in bucket order with running totals —
    * the last row carries the full statistics.
    *
    * Both are assembled only from operations IEEE 754 defines as exactly
    * rounded (÷, ×, √) over exact integer counts, so the values replay
    * bit-for-bit in any engine — the reason PSI/KL (which need `ln`, whose
    * rounding is libm-dependent) are NOT offered here. Accumulation order
    * matters for double sums, so the running totals are prefix sums in
    * bucket order (`rows unbounded preceding`), never an unordered
    * aggregate.
    *
    * Per bucket with d = cnt_a·n_b − cnt_b·n_a (exact BIGINT):
    *  - `chi2_term` = d²/(t·n_a·n_b) where t = cnt_a + cnt_b — the exact
    *    algebraic collapse of Σ_cohort (O−E)²/E for the 2×K homogeneity
    *    table (E from pooled margins);
    *  - `bc_term` = √(p_a·p_b) — the Bhattacharyya coefficient summand.
    *  - `chi2_stat` / `hellinger` = totals repeated on every row (the
    *    [[histogramDrift]] `tv_distance` convention); Hellinger distance
    *    = √(max(0, 1 − Σ bc)) ∈ [0, 1]. `df` = K−1 degrees of freedom.
    *
    * The double totals are EXPLICIT left folds over the bucket-ordered term
    * list (`aggregate(collect_list over ordered full frame)`), not plain
    * window sums — a window sum's accumulation order is an engine-internal
    * choice (sequential vs pairwise segment tree), and two orders differ in
    * low bits; the fold pins one order both engines replay (DuckDB:
    * `list_reduce(list(term ORDER BY bucket))`).
    *
    * Exactness bounds: products stay in BIGINT range for cohorts below
    * ~3·10⁹ rows (as [[histogramDrift]]); d² is squared in double space
    * (exactly rounded) so it never overflows.
    *
    * Plan shape: identical to [[histogramDrift]] — two count aggregates,
    * a #buckets-row full outer join, tiny single-task windows. */
  def driftStats(a: DataFrame, b: DataFrame, bucketCol: String): DataFrame = {
    val ca = a.groupBy(col(bucketCol)).agg(count(lit(1)).alias("cnt_a"))
    val cb = b.groupBy(col(bucketCol)).agg(count(lit(1)).alias("cnt_b"))
    val joined = ca.join(cb, Seq(bucketCol), "full_outer")
      .select(col(bucketCol),
        coalesce(col("cnt_a"), lit(0L)).alias("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).alias("cnt_b"))
    val wTot = Window.partitionBy() // #buckets rows — tiny by construction
    val wOrd = Window.partitionBy().orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val staged = joined
      .withColumn("__na", sum(col("cnt_a")).over(wTot))
      .withColumn("__nb", sum(col("cnt_b")).over(wTot))
      .withColumn("__k", count(lit(1)).over(wTot))
      .withColumn("__d",
        (col("cnt_a") * col("__nb") - col("cnt_b") * col("__na")).cast(DoubleType))
      .withColumn("__t", col("cnt_a") + col("cnt_b"))
    val ok = col("__na") > 0 && col("__nb") > 0
    val terms = staged
      .withColumn("chi2_term", when(ok,
        col("__d") * col("__d") /
          (col("__t") * col("__na") * col("__nb")).cast(DoubleType)))
      .withColumn("bc_term", when(ok, sqrt(
        (col("cnt_a").cast(DoubleType) / col("__na")) *
          (col("cnt_b").cast(DoubleType) / col("__nb")))))
    def fold(c: Column): Column =
      aggregate(collect_list(c).over(wOrd), lit(0.0), (acc, x) => acc + x)
    terms
      .withColumn("chi2_stat", when(ok, fold(col("chi2_term"))))
      .withColumn("hellinger", when(ok,
        sqrt(greatest(lit(0.0), lit(1.0) - fold(col("bc_term"))))))
      .select(col(bucketCol), col("cnt_a"), col("cnt_b"),
        col("chi2_term"), col("chi2_stat"), col("bc_term"), col("hellinger"),
        (col("__k") - 1).alias("df"))
  }

  /** Welch's unequal-variance t-test per bucket — "did the MEAN move?"
    * next to the distribution-shape measures (TV/χ²/Hellinger): per
    * bucket, the t statistic and Welch–Satterthwaite degrees of freedom
    * comparing integer-valued `valueCol` (the cents contract) between
    * cohorts `a` and `b`.
    *
    * Determinism: the per-cohort state is three exact BIGINTs
    * (n, Σy, Σy²) from one map-side-combinable aggregate each; every
    * downstream quantity (sample variance, standard error, t, df) is a
    * FIXED-ORDER composition of IEEE ops (×, ÷, −, √ — all exactly
    * rounded) on those integers, so results replay bit-for-bit.
    * Variances compute in double space as (n·Σy² − (Σy)²)/(n·(n−1)) —
    * the cross terms would overflow BIGINT at large cohorts, and the
    * double products are the same doubles in any engine. Buckets with
    * n ≤ 1 on either side, or zero pooled standard error, emit null
    * t/df (never NaN/Infinity).
    * Output: (bucket, n_a, n_b, sum_a, sum_b, t_stat, df). */
  def welchTTest(a: DataFrame, b: DataFrame, bucketCol: String,
      valueCol: Column): DataFrame = {
    def moments(df: DataFrame, suf: String) = df
      .select(col(bucketCol), valueCol.cast(LongType).alias("__y"))
      .filter(col("__y").isNotNull)
      .groupBy(col(bucketCol))
      .agg(count(lit(1)).alias(s"n_$suf"),
        sum(col("__y")).alias(s"sum_$suf"),
        sum(col("__y") * col("__y")).alias(s"__s2$suf"))
    welchFromMoments(
      moments(a, "a").join(moments(b, "b"), Seq(bucketCol), "inner"),
      bucketCol)
  }

  /** The Welch tail over an already-joined per-bucket moments table
    * (bucketCol, n_a, sum_a, __s2a, n_b, sum_b, __s2b) — the shape a
    * folded streaming [[graft.streaming.StreamingTSDF.statsDeltas]]
    * sink pivots into. Moments are additive, so stream and batch land
    * on identical integers and the fixed-order t/df match
    * bit-for-bit. */
  def welchFromMoments(j: DataFrame, bucketCol: String): DataFrame = {
    def d(c: Column) = c.cast(DoubleType)
    val (na, nb) = (d(col("n_a")), d(col("n_b")))
    val varA = (na * d(col("__s2a")) - d(col("sum_a")) * d(col("sum_a"))) /
      (na * (na - 1.0))
    val varB = (nb * d(col("__s2b")) - d(col("sum_b")) * d(col("sum_b"))) /
      (nb * (nb - 1.0))
    val (va, vb) = (varA / na, varB / nb)
    val se2 = va + vb
    val ok = col("n_a") > 1 && col("n_b") > 1 && se2 > 0.0
    val t = (d(col("sum_a")) / na - d(col("sum_b")) / nb) / sqrt(se2)
    val df_ = se2 * se2 / (va * va / (na - 1.0) + vb * vb / (nb - 1.0))
    j.select(col(bucketCol), col("n_a"), col("n_b"),
      col("sum_a"), col("sum_b"),
      when(ok, t).alias("t_stat"), when(ok, df_).alias("df"))
  }

  /** Mutual information between two categorical columns — the feature-
    * association companion to the drift family (TV/χ²/Hellinger measure
    * distribution SHIFT between cohorts; MI measures DEPENDENCE between
    * columns of one cohort — label leakage checks, redundant-feature
    * pruning, stratification-key choice). MI = Σ_xy (n_xy/N) · pmi_xy
    * with pmi_xy = ln n_xy + ln N − ln n_x − ln n_y (the overflow-safe
    * sum form).
    *
    * Determinism: all counts are exact BIGINTs; each cell's pmi
    * quantizes to exact micro-units (floor(x·10⁶ + 0.5), the BM25
    * convention), the MI numerator is the exact integer Σ n_xy·pmi_mu —
    * order-free — and only the final MI pays one double division by
    * N·10⁶. Plan: one grid count, two marginal counts derived FROM the
    * grid (O(cardinalities), never a second corpus pass), broadcast
    * one-row total. Output: one row (n_cells, n, mi_num, mi_nats). */
  def mutualInfo(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val grid = df.select(xCol.alias("__x"), yCol.alias("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(col("__x"), col("__y")).agg(count(lit(1)).alias("__nxy"))
    val mx = grid.groupBy(col("__x")).agg(sum(col("__nxy")).alias("__nx"))
    val my = grid.groupBy(col("__y")).agg(sum(col("__nxy")).alias("__ny"))
    val tot = grid.agg(sum(col("__nxy")).alias("__n"))
    val pmiMu = floor((log(col("__nxy").cast(DoubleType)) +
      log(col("__n").cast(DoubleType)) -
      log(col("__nx").cast(DoubleType)) -
      log(col("__ny").cast(DoubleType))) * 1e6 + 0.5).cast(LongType)
    grid.join(mx, Seq("__x")).join(my, Seq("__y"))
      .crossJoin(broadcast(tot))
      .select(col("__nxy"), col("__n"), (col("__nxy") * pmiMu).alias("__c"))
      .agg(count(lit(1)).alias("n_cells"), max(col("__n")).alias("n"),
        sum(col("__c")).alias("mi_num"))
      .withColumn("mi_nats",
        col("mi_num").cast(DoubleType) / (col("n").cast(DoubleType) * 1e6))
  }

}
