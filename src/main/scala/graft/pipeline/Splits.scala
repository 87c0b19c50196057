package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

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

  /** Walk-forward cross-validation folds with a PURGE EMBARGO — the
    * time-series ML hygiene split: per series, rows ntile into `nFolds`
    * time-ordered folds; for each evaluation fold f ≥ 1 the output holds
    * its validation rows (fold f) and the training rows from STRICTLY
    * EARLIER folds whose timestamp also clears `embargoSecs` before the
    * fold's first row — purging the boundary window where lookahead
    * leaks through overlapping feature windows (the López de Prado
    * purged-CV discipline, walk-forward flavor). No future fold ever
    * appears in a training set.
    *
    * Plan shape: one per-series window (the ntile), one (series × fold)
    * min aggregate joined back on (series, fold_eval), and a bounded
    * ×(nFolds−1) explode — no self-joins over the data. The aggregate's
    * row count is nSeries × nFolds — UNBOUNDED in series cardinality, so
    * it carries no forced broadcast hint: AQE broadcasts it from runtime
    * stats when it is actually small and falls back to a shuffle join on
    * the uniform (series, fold_eval) key when it is not (the
    * [[graft.pipeline.Dedup.removeBoilerplateLines]] lesson — a forced
    * hint on an unbounded side is a driver OOM at 10M series). Output:
    * input cols + fold + fold_eval + role ('train' | 'val'). */
  def walkForwardFolds(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      nFolds: Int, embargoSecs: Long): DataFrame = {
    require(nFolds >= 2, "need nFolds >= 2")
    require(embargoSecs >= 0, "embargo must be >= 0")
    val sc = seriesCols.map(col)
    val w = Window.partitionBy(sc: _*).orderBy(col(tsCol))
    val withFold = df.withColumn("fold",
      (ntile(nFolds).over(w) - 1).cast(LongType))
    val starts = withFold
      .groupBy(sc :+ col("fold").alias("fold_eval"): _*)
      .agg(min(unix_micros(col(tsCol))).alias("__fstart"))
    val evals = withFold.withColumn("fold_eval",
      explode(array((1 until nFolds).map(i => lit(i.toLong)): _*)))
    val role = when(col("fold") === col("fold_eval"), lit("val"))
      .when(col("fold") < col("fold_eval") &&
        unix_micros(col(tsCol)) <
          col("__fstart") - lit(embargoSecs * 1000000L), lit("train"))
    evals.join(starts, seriesCols :+ "fold_eval")
      .withColumn("role", role)
      .filter(col("role").isNotNull)
      .drop("__fstart")
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

  /** Deterministic per-row weighted (importance) sampling: each row
    * survives with probability `weightCol` ∈ [0, 1] — quality-score-biased
    * corpus selection ("keep high-quality docs, thin the rest"), the
    * per-row generalization of [[stratifiedSample]]'s per-stratum
    * fractions. The id hashes to a uniform bucket in [0, `buckets`); a row
    * survives iff `bucket < floor(weight · buckets)` — one double multiply
    * (exactly rounded, so engine-reproducible) and an integer compare.
    * Same rows survive on any run, partitioning, or engine; weights
    * outside [0, 1] clamp. One zero-shuffle filter pass. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      seed: Int = 19, buckets: Int = 1000000): DataFrame = {
    require(buckets > 0)
    val bucket = pmod(
      Hashing.mix(Hashing.polyHash(col(idCol).cast("string")), seed), lit(buckets))
    val w = least(greatest(col(weightCol).cast("double"), lit(0.0)), lit(1.0))
    df.filter(bucket < floor(w * buckets).cast(LongType))
  }

  /** Deterministic k-per-stratum sample: the k rows with the lowest
    * (hash(id), id) per stratum — a fixed-size uniform sample whose
    * membership is stable under reruns, repartitioning, and engine changes
    * (the property `df.sample` + `limit` lacks), so eval sets and debug
    * slices stay pinned. One exchange on the stratum key; the per-stratum
    * sort is a top-k window, and rows beyond k never leave the map side
    * when AQE sees the filter. Output: input columns + `sample_rank`
    * (1-based within the stratum). */
  def sampleKPerStratum(df: DataFrame, idCol: String, stratumCol: String,
      k: Int, seed: Int = 17): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val h = Hashing.mix(Hashing.polyHash(col(idCol).cast("string")), seed)
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(h.asc, col(idCol).asc)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Deterministic token-budget mixture: per stratum (source/domain/
    * language), keep documents until the stratum's token budget fills —
    * the "data mixture" step of a pretraining pipeline (e.g. cap web text
    * at N tokens while keeping all of a small high-quality source).
    *
    * Selection is at HASH-BUCKET granularity, which is what makes it
    * work at 100 TB: docs hash into `buckets` uniform buckets; per-
    * (stratum, bucket) token sums are a tiny aggregate (strata × buckets
    * rows); a prefix sum over that aggregate (window over ≤`buckets` rows
    * per stratum — never over documents, so no giant single partition)
    * picks the buckets whose cumulative start lies inside the budget, and
    * a semi-join keeps their documents (broadcast-hinted only when
    * `defaultBudget == 0` makes the keep set provably ≤ budgets.size ×
    * buckets rows; otherwise AQE decides from runtime size — see the
    * in-body note). Overshoot is bounded by
    * one bucket's tokens (≈ total/buckets per stratum). Fully
    * deterministic: same rows survive on any run, partitioning, engine.
    *
    * Strata absent from `budgets` get `defaultBudget` (0 = drop). */
  def tokenBudgetMixture(df: DataFrame, idCol: String, stratumCol: String,
      tokensCol: String, budgets: Map[String, Long], defaultBudget: Long = 0L,
      seed: Int = 13, buckets: Int = 4096): DataFrame = {
    require(buckets > 0 && (budgets.values ++ Seq(defaultBudget)).forall(_ >= 0))
    val bucket = pmod(
      Hashing.mix(Hashing.polyHash(col(idCol).cast("string")), seed), lit(buckets))
    val perBucket = df
      .select(col(stratumCol), bucket.alias("__b"),
        col(tokensCol).cast(LongType).alias("__t"))
      .groupBy(col(stratumCol), col("__b"))
      .agg(sum(col("__t")).alias("__bt"))
    val w = Window.partitionBy(col(stratumCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = budgets.toSeq.sortBy(_._1)
      .foldLeft[Column](lit(defaultBudget)) { case (acc, (s, b)) =>
        when(col(stratumCol) === s, lit(b)).otherwise(acc)
      }
    val keepBuckets = perBucket
      .withColumn("__start", sum(col("__bt")).over(w) - col("__bt"))
      .filter(col("__start") < budget)
      .select(col(stratumCol), col("__b"))
    // broadcast is forced only when the keep set is bounded BY CONSTRUCTION:
    // with defaultBudget == 0 only budgeted strata survive the filter, so
    // keepBuckets <= budgets.size × buckets rows — a literal bound. With a
    // positive default, EVERY stratum keeps buckets and stratum cardinality
    // is unbounded (10M domains × 4096 buckets is not a broadcast); the
    // hint is dropped and AQE broadcasts from measured runtime size when
    // the set is actually small, or shuffles the uniform (stratum, bucket)
    // key when it is not — the walkForwardFolds discipline
    val keepHinted =
      if (defaultBudget == 0L) broadcast(keepBuckets) else keepBuckets
    df.withColumn("__b", bucket)
      .join(keepHinted, Seq(stratumCol, "__b"), "left_semi")
      .select(df.columns.toIndexedSeq.map(col): _*) // using-cols jump first; restore order
  }

  /** Temperature-based mixture reweighting — the exponentiated sampling
    * recipe of multilingual/multi-source LM training (sampling mass
    * p_i ∝ c_i^α with α ∈ (0,1] flattening the source distribution; the
    * published XLM-R/mT5-style α=0.3..0.7 family): per-stratum token
    * counts from ONE map-side-combinable aggregate (output = strata
    * cardinality, tiny at any corpus scale), the exponentiated weight
    * quantized to integer micro-units (floor(c^α·10⁶ + 0.5) — the
    * q_bm25_multi discipline, so the cross-stratum normalizer is an
    * ORDER-FREE integer sum, identical on every engine/partitioning),
    * then `sample_prob = w_i/W` (one IEEE division) and
    * `token_budget = floor(sample_prob · totalBudget)` (one more IEEE
    * op, fixed order). The budgets feed [[tokenBudgetMixture]] directly
    * to materialize the selection. At α = 0.5 (the default) the weight
    * uses `sqrt`, which IEEE-754 requires correctly rounded — bit-exact
    * replay on any engine; other α go through `pow`, deterministic
    * within Spark but only ulp-close across engines (documented, not
    * oracle-gated). The whole operator is one aggregate + a window over
    * the strata-count rollup — no per-document window, no second pass
    * over the corpus. */
  def temperatureBudgets(df: DataFrame, stratumCol: String,
      tokensCol: String, totalBudget: Long,
      alpha: Double = 0.5): DataFrame = {
    require(totalBudget >= 0L, "totalBudget must be >= 0")
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val counts = df
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).alias("n_docs"),
        sum(col(tokensCol).cast(LongType)).alias("n_tokens"))
    val mass = if (alpha == 0.5) sqrt(col("n_tokens").cast(DoubleType))
      else pow(col("n_tokens").cast(DoubleType), alpha)
    // the rollup is strata-sized, so the unpartitioned window is bounded
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val prob = col("weight_micro").cast(DoubleType) /
      col("__w").cast(DoubleType)
    counts
      .withColumn("weight_micro",
        floor(mass * 1e6 + lit(0.5)).cast(LongType))
      .withColumn("__w", sum(col("weight_micro")).over(all))
      .select(col(stratumCol), col("n_docs"), col("n_tokens"),
        col("weight_micro"), prob.alias("sample_prob"),
        floor(prob * lit(totalBudget).cast(DoubleType)).cast(LongType)
          .alias("token_budget"))
  }

  /** Curriculum shard assignment: rows sort conceptually by `scoreCol`
    * DESCENDING (easiest/highest-quality first) and split into `nShards`
    * contiguous shards of roughly equal total `tokensCol` — the standard
    * curriculum / annealing data layout (shard 0 = the best slice,
    * trained first or last per recipe).
    *
    * NO global row sort: like [[tokenBudgetMixture]], the cut points come
    * from a histogram — per-score-value token sums (scores are enforced
    * integer-valued, i.e. pre-quantized, so the histogram is bounded by
    * the score resolution, NOT the corpus), a prefix sum over that tiny
    * aggregate ordered by score desc, and
    * shard = min(nShards−1, cumBefore div ceil(total/nShards)) — exact
    * integer arithmetic end to end. Rows sharing a score value land in
    * the same shard (granularity = one score bucket; shard token totals
    * deviate by at most one bucket's tokens). The histogram windows run
    * over score-distinct rows only — never over documents — and the
    * score→shard map joins back as a broadcast.
    * Output: input row + `shard`. */
  def curriculumShards(df: DataFrame, scoreCol: String, tokensCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val hist = df
      .select(graft.tsdf.Stats.integralOrFail(col(scoreCol), "curriculumShards")
        .alias("__s"), col(tokensCol).cast(LongType).alias("__t"))
      .groupBy(col("__s")).agg(sum(col("__t")).alias("__bt"))
    val ord = Window.orderBy(col("__s").desc)
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val total = sum(col("__bt")).over(all)
    val cumBefore = coalesce(sum(col("__bt")).over(before), lit(0L))
    // ceil(total/n) as an exact integer (floor of a double division of
    // integers < 2^53 — exact in any engine)
    val budget = floor((total + lit((nShards - 1).toLong)) / lit(nShards.toLong))
    val shardMap = hist.select(col("__s"),
      least(lit((nShards - 1).toLong),
        floor(cumBefore.cast(DoubleType) / budget).cast(LongType))
        .alias("shard"))
    df.withColumn("__s",
        graft.tsdf.Stats.integralOrFail(col(scoreCol), "curriculumShards"))
      .join(broadcast(shardMap), Seq("__s"))
      .drop("__s")
  }
}
