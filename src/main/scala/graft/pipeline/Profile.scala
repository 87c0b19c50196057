package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the sanity pass a pipeline runs on every
  * new source before trusting it (completeness and cardinality drive
  * schema checks, join-key selection, and partition-column choices).
  *
  * Reference scope note: tempo has no profiler; this serves the
  * training-data pipeline side.
  */
object Profile {

  /** Per-column completeness + cardinality: one row per profiled column
    * with (column, n_rows, n_nonnull, n_distinct). Distinct counts are
    * EXACT (count(DISTINCT) — Catalyst plans one pass via Expand, at the
    * cost of a row-multiplying shuffle by the number of profiled columns);
    * at corpus scale profile a sample, or swap the cardinality leg for
    * [[Sketch.kmvDistinct]] (deterministic estimate, one distinct per
    * column). The wide aggregate pivots to long form with an array-explode
    * — no second pass, no driver round-trip. */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = count(lit(1)).alias("__n") +:
      cols.flatMap(c => Seq(
        count(col(c)).alias(s"__nn_$c"),
        countDistinct(col(c)).alias(s"__nd_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.map(c =>
      struct(lit(c).alias("column"), col("__n").alias("n_rows"),
        col(s"__nn_$c").alias("n_nonnull"),
        col(s"__nd_$c").alias("n_distinct"))): _*)
    wide.select(explode(entries).alias("__e")).select(col("__e.*"))
  }

  /** Order-independent table fingerprint: one row of
    * (n_rows, hash_sum, hash_sq_sum) where each row contributes the
    * engine-agnostic polynomial hash of its canonical representation —
    * commutative integer sums, so the fingerprint is a pure function of
    * the row MULTISET (partitioning, file order, shuffle plans are all
    * invisible) and two snapshots compare by three integers instead of a
    * full sort-merge diff. The squared-hash sum (reduced mod P before
    * summing — exact in 64 bits at any row count up to ~2^33) catches
    * edits that preserve the plain sum. Map-side combinable; shard
    * fingerprints merge by adding the three counters.
    *
    * `cols` should be integer/string/date columns: floating-point columns
    * render engine-specific strings and must be quantized first (the
    * cents discipline used across this codebase). Nulls are marked
    * distinctly from the string "null". */
  def tableFingerprint(df: DataFrame,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val repr = concat_ws("\u001f",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0001null"))): _*)
    val h = Hashing.mix(Hashing.polyHash(repr), 41)
    df.agg(count(lit(1)).alias("n_rows"),
      sum(h).alias("hash_sum"),
      sum(pmod(h * h, lit(Hashing.P))).alias("hash_sq_sum"))
  }

  /** Key-skew diagnostic for join/groupBy planning: the k heaviest values
    * of `keyCol` with exact counts and their share of all rows — the
    * number that decides between a plain shuffle join, salting, or an AQE
    * skew split at 100 TB (one hot key taking >1/parallelism of the rows
    * serializes the stage). One map-side-combinable count aggregate, then
    * TakeOrdered over the distinct keys (no global sort materialization);
    * ties break on the key itself so the answer is deterministic.
    * Output: (key, cnt, total, share). */
  def keySkew(df: DataFrame, keyCol: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.types.DoubleType
    val counts = df.select(keyCol.cast("string").alias("key"))
      .groupBy(col("key")).agg(count(lit(1)).alias("cnt"))
    // both branches hang off the SAME groupBy exchange, so runtime
    // exchange reuse computes the key counts (and the corpus scan) once
    val total = counts.agg(sum(col("cnt")).alias("total"))
    counts.orderBy(col("cnt").desc, col("key").asc).limit(k)
      .crossJoin(broadcast(total))
      .select(col("key"), col("cnt"), col("total"),
        (col("cnt").cast(DoubleType) / col("total").cast(DoubleType))
          .alias("share"))
  }

  /** Pairwise Pearson correlation over fixed-point-scaled columns in ONE
    * aggregate pass: every Σx, Σx², Σxy moment is an exact BIGINT sum of
    * scaled longs (order-independent — a raw double Σxy would depend on
    * partition merge order), pivoted to one row per column pair, with the
    * final Pearson formula a fixed sequence of IEEE ops (mult/sub/sqrt are
    * all correctly rounded, so the doubles replay bit-identically in any
    * engine).
    *
    * `cols` maps each column to its fixed-point scale (x → round(x·scale)
    * as BIGINT). Magnitude bound (caller-owned, like the SAX cents bound):
    * Σ(x·scale)² and Σ|x·y·scale_x·scale_y| must stay below 2^63 — Spark
    * wraps silently past it while DuckDB errors. scale·max|x| ≤ ~10^6 with
    * row counts ≤ ~10^6·n safely fits; pick dollar resolution for big
    * monetary columns rather than cents if needed.
    *
    * Output: (col_x, col_y, n, corr) for each unordered pair, corr null
    * when either column is constant. */
  def pairwiseCorrelation(df: DataFrame,
      cols: Seq[(String, Long)]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val names = cols.map(_._1)
    val scaled = cols.map { case (c, s) =>
      floor(col(c) * lit(s.toDouble) + lit(0.5)).cast(LongType).alias(s"__$c")
    }
    val pairs = for {
      i <- names.indices; j <- names.indices if i < j
    } yield (names(i), names(j))
    val aggs = count(lit(1)).alias("__n") +:
      (names.flatMap(c => Seq(
        sum(col(s"__$c")).alias(s"__s_$c"),
        sum(col(s"__$c") * col(s"__$c")).alias(s"__ss_$c"))) ++
        pairs.map { case (a, b) =>
          sum(col(s"__$a") * col(s"__$b")).alias(s"__sp_${a}_$b")
        })
    val wide = df.select(scaled: _*).agg(aggs.head, aggs.tail: _*)
    val entries = array(pairs.map { case (a, b) =>
      struct(lit(a).alias("col_x"), lit(b).alias("col_y"),
        col("__n").alias("n"),
        col(s"__s_$a").alias("sx"), col(s"__s_$b").alias("sy"),
        col(s"__ss_$a").alias("sxx"), col(s"__ss_$b").alias("syy"),
        col(s"__sp_${a}_$b").alias("sxy"))
    }: _*)
    def d(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
    val e = wide.select(explode(entries).alias("__e")).select(col("__e.*"))
    val num = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val denx = sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")))
    val deny = sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))
    e.select(col("col_x"), col("col_y"), col("n"),
      when(denx * deny > 0.0, num / (denx * deny)).alias("corr"))
  }

  /** The nine Benford first-digit proportions log₁₀(1 + 1/d), computed
    * once on the JVM so the oracle can embed the identical double
    * literals. */
  private[graft] val benfordP: Map[Int, Double] =
    (1 to 9).map(d => d -> math.log10(1 + 1.0 / d)).toMap

  /** Benford first-digit audit: for each group, the distribution of first
    * significant digits of a POSITIVE integer-valued column (scale to
    * cents upstream; zero/negative rows are excluded) against Benford's
    * law — the classic fabricated-data / unit-mixup screen. The first
    * digit comes from the integer's decimal string (no log10 on the data
    * path — digit extraction is exact at power-of-ten boundaries), counts
    * are exact BIGINTs, `observed_p` one terminal division, `expected_p` a
    * shared JVM-computed literal, `dev` one subtraction. ONE exchange on
    * (group, digit) + a group-total window.
    * Output: groupCols + (digit, n, n_total, observed_p, expected_p,
    * dev). */
  def benfordDigits(df: DataFrame, valueCol: String,
      groupCols: Seq[String]): DataFrame = {
    val v = graft.tsdf.Stats.integralOrFail(col(valueCol), "benfordDigits")
    val digit = substring(col("__v").cast("string"), 1, 1).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    val expected = (1 to 9).foldRight(lit(null).cast("double")) {
      case (d, acc) => when(col("digit") === d, lit(benfordP(d))).otherwise(acc)
    }
    df.withColumn("__v", v).filter(col("__v") > 0)
      .withColumn("digit", digit)
      .groupBy((groupCols.map(col) :+ col("digit")): _*)
      .agg(count(lit(1)).alias("n"))
      .withColumn("n_total", sum(col("n")).over(w))
      .withColumn("observed_p", col("n").cast("double") / col("n_total"))
      .withColumn("expected_p", expected)
      .withColumn("dev", col("observed_p") - col("expected_p"))
  }

  /** Functional-dependency check x → y: for every distinct x, how many
    * distinct y values it maps to — the schema-inference / data-quality
    * probe ("is user_id → country actually a key relationship, and
    * where does it break?"). A clean FD has every key at
    * n_distinct_y = 1; violating keys are join-explosion and
    * dirty-dimension warnings before they corrupt a downstream
    * aggregate.
    *
    * One exact distinct-count aggregate per key (map-side combinable
    * after the internal distinct), all BIGINTs — engine-exact. Returns
    * the PER-KEY table (x, n_rows, n_distinct_y, is_violation);
    * [[fdSummary]] collapses it to the one-row report. Scale: output is
    * |distinct x| rows — the profile artifact itself, not a sample. */
  def fdCheck(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    df.select(xCol.alias("x"), yCol.alias("y"))
      .filter(col("x").isNotNull)
      .groupBy(col("x"))
      .agg(count(lit(1)).alias("n_rows"),
        count_distinct(col("y")).alias("n_distinct_y"))
      .withColumn("is_violation", col("n_distinct_y") > 1)
  }

  /** Gini concentration per group — the inequality diagnostic ("is this
    * source's token mass concentrated in a few documents? is revenue
    * concentrated in a few customers?"), the scalar companion to
    * key-skew profiling. Standard rank formula over values sorted
    * ascending within the group: G = 2·Σᵢ i·yᵢ / (n·Σy) − (n+1)/n,
    * i = 1-based rank by (value, tie).
    *
    * Determinism: `valueCol` is integer-valued (cents contract), the
    * rank is total-ordered by the tie column, and Σ i·yᵢ / Σy / n are
    * exact BIGINTs emitted alongside the two fixed-order terminal
    * divisions — engine-exact. Requires non-negative values (Gini is
    * undefined under mixed signs); groups with Σy = 0 emit null.
    *
    * Scale: one rank window per group partition (uniform keys, the
    * RFM/ntile shape) + one map-side-combinable aggregate. */
  def giniConcentration(df: DataFrame, groupCols: Seq[String],
      valueCol: Column, tieCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val ranked = df
      .select(groupCols.map(col) :+ valueCol.alias("__y") :+
        tieCol.alias("__t"): _*)
      .filter(col("__y").isNotNull)
      .withColumn("__i", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)
          .orderBy(col("__y").asc, col("__t").asc)).cast("long"))
    val agg = ranked.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).alias("n"),
        sum(col("__y")).alias("sum_y"),
        sum(col("__i") * col("__y")).alias("sum_iy"))
    // n·Σy multiplies in DOUBLE space: as a Long product it wraps silently
    // past 2^63 (plausible at corpus-scale cent sums), where DuckDB's
    // BIGINT multiply would error — a silent cross-engine divergence.
    // Both engines' double multiply is correctly rounded, so parity holds.
    agg.withColumn("gini",
      when(col("sum_y") > 0,
        lit(2.0) * col("sum_iy").cast("double") /
          (col("n").cast("double") * col("sum_y").cast("double")) -
          (col("n") + 1L).cast("double") / col("n").cast("double")))
  }

  /** One-row FD report over [[fdCheck]]'s per-key table: key counts,
    * violation count and ratio (one terminal division), and the worst
    * key's fan-out. */
  def fdSummary(perKey: DataFrame): DataFrame = {
    perKey.agg(
      count(lit(1)).alias("n_keys"),
      sum(when(col("is_violation"), 1L).otherwise(0L)).alias("n_violating"),
      max(col("n_distinct_y")).alias("max_fanout"))
      .withColumn("violation_ratio",
        col("n_violating").cast("double") / col("n_keys").cast("double"))
  }
}
