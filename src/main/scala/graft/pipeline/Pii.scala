package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.types.{DoubleType, LongType}

/** PII detection and redaction for training-data pipelines: per-category
  * match counts plus a redacted text column (emails, IPv4 addresses,
  * phone numbers, SSN-shaped ids).
  *
  * Patterns are restricted to the Java-regex ∩ RE2 common subset —
  * character classes, bounded repetition, ASCII `\b` word boundaries; no
  * backreferences or lookaround — so Spark (java.util.regex), DuckDB (RE2)
  * and any RE2-based scale-out engine match byte-identically. Everything is
  * per-row Column algebra: zero shuffles, embarrassingly parallel at any
  * corpus size, and the regexes stay inside whole-stage codegen.
  */
object Pii {

  /** (category, pattern, replacement token), applied in order. Email runs
    * first so an address's digits can't be half-claimed by the numeric
    * patterns; SSN (strict `ddd-dd-dddd`) and phone (`ddd[-.]ddd[-.]dddd`)
    * shapes are mutually exclusive by digit-group lengths. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("emails", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phones", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"))

  /** Per-category non-overlapping match counts, each computed independently
    * on the raw text (a character consumed by one category still counts
    * toward another — counts answer "how much PII of kind X", not "what
    * does redaction remove"). */
  def counts(text: Column): Seq[Column] =
    Patterns.map { case (name, pat, _) =>
      regexp_count(text, lit(pat)).cast(LongType).alias(s"n_$name")
    }

  /** Text with every PII match replaced by its category token, categories
    * applied in [[Patterns]] order. */
  def redact(text: Column): Column =
    Patterns.foldLeft(text) { case (t, (_, pat, repl)) =>
      regexp_replace(t, pat, repl)
    }

  /** k-anonymity gate: a row is releasable iff its quasi-identifier
    * combination is shared by at least `k` rows — the suppression rule a
    * dataset release applies AFTER regex redaction (rare attribute
    * combinations re-identify even with direct identifiers scrubbed).
    * Adds `group_n` (exact combination count) and `k_anon_ok`; callers
    * filter or generalize the failing rows. ONE exchange on the
    * quasi-identifier key (count window). */
  def kAnonymize(df: org.apache.spark.sql.DataFrame, quasiCols: Seq[String],
      k: Long): org.apache.spark.sql.DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*)
    df.withColumn("group_n", count(lit(1)).over(w))
      .withColumn("k_anon_ok", col("group_n") >= k)
  }

  /** l-diversity gate: a row is releasable iff its quasi-identifier
    * combination covers at least `l` DISTINCT values of the sensitive
    * attribute — the companion to [[kAnonymize]] (a large group whose
    * sensitive value is constant still leaks it; k-anonymity alone can't
    * see that). Adds `group_l` (exact distinct-sensitive count) and
    * `l_diverse_ok`. Distinct-count windows can't partial-aggregate, so
    * the count runs as a distinct + aggregate on the quasi key joined
    * back row-level — both shuffles on the same key, map-side combinable.
    *
    * NULL policy (explicit): a NULL sensitive value does NOT count toward
    * `l` (an absent attribute can't diversify what an attacker learns
    * from the group), and rows whose quasi-identifier contains NULLs are
    * KEPT and gated like any other group — the join back is null-safe
    * (`<=>`) and LEFT, matching [[kAnonymize]]'s window semantics, so no
    * row silently disappears from the release gate. A quasi group whose
    * sensitive values are all NULL gets `group_l = 0`. */
  def lDiversity(df: org.apache.spark.sql.DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): org.apache.spark.sql.DataFrame = {
    require(l >= 1, "l must be >= 1")
    val gq = quasiCols.map(c => s"__g_$c")
    val groups = df
      .select((quasiCols :+ sensitiveCol).map(col): _*)
      .filter(col(sensitiveCol).isNotNull)
      .distinct()
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).alias("group_l"))
    val renamed = quasiCols.zip(gq).foldLeft(groups) {
      case (d, (n, gn)) => d.withColumnRenamed(n, gn)
    }
    val cond = quasiCols.zip(gq).map { case (n, gn) => col(n) <=> col(gn) }
      .reduce(_ && _)
    df.join(renamed, cond, "left")
      .drop(gq: _*)
      .withColumn("group_l", coalesce(col("group_l"), lit(0L)))
      .withColumn("l_diverse_ok", col("group_l") >= l)
  }

  /** t-closeness gate (Li et al., ICDE 2007) — the third member of the
    * release family: a quasi-identifier group passes iff the Earth Mover's
    * Distance between ITS sensitive-value distribution and the GLOBAL one
    * is ≤ `t` (k-anonymity bounds group size, l-diversity bounds distinct
    * sensitive values, but a group whose distribution is merely *skewed*
    * toward one value still leaks — EMD is the fix the paper proposes).
    * For an ORDERED sensitive attribute with equal-step ground distance,
    * EMD = (1/(m−1)) · Σᵢ |Σ_{j≤i} (p_j − q_j)| over the m global values
    * in order.
    *
    * Exactness: p_j − q_j = c_j/n_g − C_j/N is kept as the INTEGER
    * c_j·N − C_j·n_g over the common denominator n_g·N, so every
    * cumulative sum and absolute value is exact 64-bit arithmetic and the
    * single terminal division (emd_num / (n_g·N·(m−1))) is correctly
    * rounded — bit-reproducible on any engine. Requires N²·m < 2⁶³
    * (N = non-null rows, m = distinct sensitive values): with a BOUNDED
    * ordinal sensitive column (a decile/bucket — the intended usage, and
    * what the paper's numeric EMD assumes) this holds to corpus sizes of
    * ~10⁹ rows per release slice.
    *
    * Scale shape: one shuffle on (quasi, v) for the cell counts, a
    * groups×m broadcast cross join (global distribution is m rows), a
    * window running sum over the m-per-group expansion — all post-shuffle
    * tables are O(groups·m) ≪ corpus. NULL sensitive values are excluded
    * from both distributions (the [[lDiversity]] convention); NULL quasi
    * values form their own gated groups. Output: one row per quasi group
    * with group_n, emd_num (exact integer numerator), emd, t_close_ok. */
  def tCloseness(df: org.apache.spark.sql.DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, t: Double): org.apache.spark.sql.DataFrame = {
    require(t >= 0.0, "t must be >= 0")
    val base = df.select((quasiCols :+ sensitiveCol).map(col): _*)
      .filter(col(sensitiveCol).isNotNull)
    val global = base.groupBy(col(sensitiveCol).alias("__v"))
      .agg(count(lit(1)).alias("__cv"))
    val totals = global.agg(sum(col("__cv")).alias("__n"),
      count(lit(1)).alias("__m"))
    val gv0 = base
      .groupBy((quasiCols.map(col) :+ col(sensitiveCol).alias("__v")): _*)
      .agg(count(lit(1)).alias("__c"))
    val groups = gv0.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__c")).alias("group_n"))
    val gq = quasiCols.map(c => s"__g_$c")
    val gv = quasiCols.zip(gq).foldLeft(
      gv0.withColumnRenamed("__v", "__gv")) {
      case (d, (n, gn)) => d.withColumnRenamed(n, gn)
    }
    val cond = quasiCols.zip(gq).map { case (n, gn) => col(n) <=> col(gn) }
      .reduce(_ && _) && col("__v") === col("__gv")
    val expanded = groups
      .crossJoin(broadcast(global))
      .crossJoin(broadcast(totals))
      .join(gv, cond, "left")
      .select((quasiCols.map(col) ++ Seq(col("group_n"), col("__v"),
        col("__cv"), col("__n"), col("__m"),
        coalesce(col("__c"), lit(0L)).alias("__c"))): _*)
      .withColumn("__diff",
        col("__c") * col("__n") - col("__cv") * col("group_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*)
      .orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    expanded
      .withColumn("__cum", sum(col("__diff")).over(w))
      .groupBy((quasiCols.map(col) :+ col("group_n")): _*)
      .agg(sum(abs(col("__cum"))).alias("emd_num"),
        first(col("__n")).alias("__n"), first(col("__m")).alias("__m"))
      .withColumn("emd",
        when(col("__m") > 1, col("emd_num").cast(DoubleType) /
          (col("group_n") * col("__n") * (col("__m") - lit(1L)))
            .cast(DoubleType))
          .otherwise(lit(0.0)))
      .withColumn("t_close_ok", col("emd") <= t)
      .drop("__n", "__m")
  }
}
