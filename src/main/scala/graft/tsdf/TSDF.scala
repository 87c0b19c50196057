package graft.tsdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core time-series DataFrame abstraction.
  *
  * A TSDF wraps a plain Spark DataFrame together with metadata naming one
  * distinguished timestamp column (`tsCol`), the series-identifier columns
  * (`partitionCols` — each distinct tuple is one logical time series) and an
  * optional tie-breaking `sequenceCol`. All operators are lazy DataFrame→
  * DataFrame transformations; ordering is imposed per-operator via window
  * specs, never materialized.
  *
  * Reference semantics: /root/reference/python/tempo/tsdf.py:28-77 (ctor),
  * :949-989 (windows), :389-573 (projection/slicing/top-k).
  * Implementation is original, Spark-first Scala.
  */
case class TSDF(
    df: DataFrame,
    tsCol: String = "event_ts",
    partitionCols: Seq[String] = Seq.empty,
    sequenceCol: Option[String] = None,
    resampleSpec: Option[ResampleSpec] = None
) {
  // ---- validation (case-insensitive column existence, tsdf.py:163-189) ----
  private def requireCol(c: String): String =
    df.columns
      .find(_.equalsIgnoreCase(c))
      .getOrElse(throw new IllegalArgumentException(
        s"Column '$c' not found among ${df.columns.mkString(", ")}"))
  require(df.columns.exists(_.equalsIgnoreCase(tsCol)), s"ts column '$tsCol' missing")
  partitionCols.foreach(requireCol)
  sequenceCol.foreach(requireCol)

  def ts: Column = col(tsCol)
  def seriesCols: Seq[Column] = partitionCols.map(col)

  /** Columns that are neither ts, series ids, nor the sequence col. */
  def observationalCols: Seq[String] =
    df.columns.filterNot(c =>
      c == tsCol || partitionCols.contains(c) || sequenceCol.contains(c)).toSeq

  /** Numeric observation columns (auto metric discovery, tsdf.py:1136-1149). */
  def metricCols: Seq[String] = {
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    observationalCols.filter(c => byName(c).isInstanceOf[NumericType])
  }

  // ---- windows (tsdf.py:949-989) ----
  def baseWindow(reverse: Boolean = false): WindowSpec = {
    val ord0 = if (reverse) ts.desc else ts.asc
    val ord = sequenceCol match {
      case Some(s) => Seq(ord0, if (reverse) col(s).desc else col(s).asc)
      case None    => Seq(ord0)
    }
    Window.partitionBy(seriesCols: _*).orderBy(ord: _*)
  }

  /** Value-based frame over epoch seconds (requires numeric sort col). */
  def rangeBetweenWindow(lower: Long, upper: Long, sortCol: Column): WindowSpec =
    Window.partitionBy(seriesCols: _*).orderBy(sortCol).rangeBetween(lower, upper)

  def rowsBetweenWindow(lower: Long, upper: Long, reverse: Boolean = false): WindowSpec =
    baseWindow(reverse).rowsBetween(lower, upper)

  // ---- projection (tsdf.py:389-418) ----
  def select(cols: String*): TSDF = {
    val mandatory = (tsCol +: partitionCols) ++ sequenceCol
    val missing = mandatory.filterNot(cols.contains)
    require(missing.isEmpty, s"select must retain ${missing.mkString(", ")}")
    copy(df = df.select(cols.map(col): _*))
  }

  def withPartitionCols(newPartitionCols: Seq[String]): TSDF =
    copy(partitionCols = newPartitionCols)

  // ---- time slicing (tsdf.py:420-506): plain pushdown-friendly filters ----
  def at(t: Any): TSDF = copy(df = df.filter(ts === lit(t)))
  def before(t: Any): TSDF = copy(df = df.filter(ts < lit(t)))
  def atOrBefore(t: Any): TSDF = copy(df = df.filter(ts <= lit(t)))
  def after(t: Any): TSDF = copy(df = df.filter(ts > lit(t)))
  def atOrAfter(t: Any): TSDF = copy(df = df.filter(ts >= lit(t)))

  def between(start: Any, end: Any, inclusive: Boolean = true): TSDF =
    if (inclusive) copy(df = df.filter(ts >= lit(start) && ts <= lit(end)))
    else copy(df = df.filter(ts > lit(start) && ts < lit(end)))

  // ---- top-k per series (tsdf.py:508-573) ----
  private def topRows(win: WindowSpec, n: Int): TSDF = {
    val rn = "__graft_rn"
    copy(df = df
      .withColumn(rn, row_number().over(win))
      .filter(col(rn) <= n)
      .drop(rn))
  }

  /** First n rows of each series in time order. */
  def earliest(n: Int = 1): TSDF = topRows(baseWindow(reverse = false), n)

  /** Last n rows of each series (reverse time order). */
  def latest(n: Int = 1): TSDF = topRows(baseWindow(reverse = true), n)

  /** Up to n rows at-or-before `t`, most recent last (as-of select). */
  def priorTo(t: Any, n: Int = 1): TSDF = atOrBefore(t).latest(n)

  /** Up to n rows at-or-after `t`. */
  def subsequentTo(t: Any, n: Int = 1): TSDF = atOrAfter(t).earliest(n)

  /** k most recent rows per series, globally ordered (display helper,
    * tsdf.py:579-620). */
  def showSlice(k: Int = 5): DataFrame =
    latest(k).df.orderBy(seriesCols :+ ts.asc: _*)

  // ---- describe (tsdf.py:622-700) ----
  /** One unioned summary DataFrame, reference shape: a `global` row (series
    * count, min/max ts, inferred granularity) followed by Spark `describe()`
    * rows and a `missing_vals_pct` row, with the four global attributes as
    * leading columns. Eager (3 jobs) like the reference. Granularity is
    * derived from exact integer epoch-µs rather than the double-seconds CASE
    * (identical for any representable timestamp, engine-reproducible).
    *
    * NOTE — determinism trade-off: `mean` and `stddev` of Double/Float
    * columns are computed on cent-quantized values (`round(x·100)/100`), so
    * for data with more than 2 decimal places they are approximations of the
    * raw-value statistics. Quantization makes the sums order-independent —
    * the summary renders the same digits on any engine, partitioning or run,
    * which a raw double aggregate cannot guarantee. Integer-typed columns
    * are summarized exactly. Use `withGroupedStats` (or a plain `agg`) when
    * full-precision floating-point moments matter more than reproducible
    * display output. */
  def describe(): DataFrame = {
    val dblTsCol = s"${tsCol}_dbl"
    val thisDf = df.withColumn(dblTsCol, ts.cast(DoubleType))
    val nonTsFields = thisDf.schema.fields
      .filterNot(_.dataType == TimestampType).toSeq
    val nonTsCols = nonTsFields.map(_.name)

    // Deterministic 4-decimal rendering built from integer/string ops — the
    // same digits in any engine, unlike Double.toString (whose shortest-repr
    // output is engine- and JDK-version-specific). Means/stddevs of
    // fractional metrics are computed on exact integer cents so their sums
    // are order-independent; see the determinism notes in SparkEntry.
    def fmt4(x: Column): Column = {
      val sc = round(x * 10000).cast(LongType)
      val asb = abs(sc)
      when(x.isNull, lit(null).cast(StringType)).otherwise(concat(
        when(sc < 0, lit("-")).otherwise(lit("")),
        floor(asb.cast(DoubleType) / 10000).cast(LongType).cast(StringType),
        lit("."), lpad(pmod(asb, lit(10000L)).cast(StringType), 4, "0")))
    }
    def momentSd(c: Column, scale: Double): Column = {
      val cnt = count(c)
      val s1 = sum(c)
      val s2 = sum(c * c)
      when(cnt > 1, sqrt((cnt * s2 - s1 * s1) / (cnt * (cnt - 1))) / scale)
    }
    def meanOf(f: StructField): Column = f.dataType match {
      case DoubleType | FloatType => fmt4(avg(round(col(f.name) * 100)) / 100)
      case _: NumericType => fmt4(avg(col(f.name)))
      case _ => lit(null).cast(StringType)
    }
    def sdOf(f: StructField): Column = f.dataType match {
      case DoubleType | FloatType => fmt4(momentSd(round(col(f.name) * 100), 100.0))
      case _: NumericType => fmt4(momentSd(col(f.name).cast(DoubleType), 1.0))
      case _ => lit(null).cast(StringType)
    }
    def aggRow(name: String, valueFor: StructField => Column): DataFrame =
      thisDf.groupBy().agg(
        valueFor(nonTsFields.head).cast(StringType).alias(nonTsFields.head.name),
        nonTsFields.tail.map(f => valueFor(f).cast(StringType).alias(f.name)): _*)
        .select(lit(name).alias("summary") +: nonTsCols.map(col): _*)

    val descStats = aggRow("count", f => count(col(f.name)))
      .unionByName(aggRow("mean", meanOf))
      .unionByName(aggRow("stddev", sdOf))
      .unionByName(aggRow("min", f => min(col(f.name))))
      .unionByName(aggRow("max", f => max(col(f.name))))
      .unionByName(aggRow("missing_vals_pct",
        f => lit(100) * count(when(col(f.name).isNull, lit(1))) / count(lit(1))))
    // eager global attributes (reference behavior, tsdf.py:651-666)
    val uniqueTs = thisDf.select(partitionCols.map(col): _*).distinct().count()
    val mm = df.agg(min(ts).cast(StringType), max(ts).cast(StringType)).head()
    val us = unix_micros(ts)
    val granularity = df.agg(min(
      when(pmod(us, lit(1000000L)) =!= 0, "1-millis")
        .when(pmod(us, lit(60L * 1000000)) =!= 0, "2-seconds")
        .when(pmod(us, lit(3600L * 1000000)) =!= 0, "3-minutes")
        .when(pmod(us, lit(86400L * 1000000)) =!= 0, "4-hours")
        .otherwise("5-days"))).head().getString(0).substring(2)
    val nonSummary = descStats.columns.filterNot(_ == "summary").toSeq
    val globalCols = Seq("unique_time_series_count", "min_ts", "max_ts", "granularity")
    val shaped = descStats.select(
      (col("summary") +: globalCols.map(c => lit(" ").alias(c))) ++
        nonSummary.map(col): _*)
    val globalRow = descStats.limit(1).select(
      lit("global").alias("summary") +:
        Seq(lit(uniqueTs.toString).alias("unique_time_series_count"),
          lit(mm.getString(0)).alias("min_ts"),
          lit(mm.getString(1)).alias("max_ts"),
          lit(granularity).alias("granularity")) ++:
        nonSummary.map(c => lit(" ").alias(c)): _*)
    globalRow.unionByName(shaped)
  }

  /** Resample pre-flight summary (ref utils.py:53-136). */
  def calculateTimeHorizon(freq: String): DataFrame = TimeHorizon.summary(this, freq)

  /** Per-series expected-bucket diagnostics behind [[calculateTimeHorizon]]. */
  def timeHorizonPerSeries(freq: String): DataFrame = TimeHorizon.perSeries(this, freq)

  // ---- delegated operators (separate modules) ----
  def asofJoin(
      right: TSDF,
      leftPrefix: Option[String] = None,
      rightPrefix: String = "right",
      tsPartitionVal: Option[Long] = None,
      fraction: Double = 0.5,
      skipNulls: Boolean = true,
      sqlJoinOpt: Boolean = false,
      tolerance: Option[Double] = None): TSDF =
    AsOfJoin(this, right, leftPrefix, rightPrefix, tsPartitionVal, fraction,
      skipNulls, sqlJoinOpt, tolerance)

  /** Forward as-of: attach the earliest right row with right.ts >= ts. */
  def asofJoinNext(
      right: TSDF,
      leftPrefix: Option[String] = None,
      rightPrefix: String = "right",
      skipNulls: Boolean = true,
      tolerance: Option[Double] = None): TSDF =
    AsOfJoin.forward(this, right, leftPrefix, rightPrefix, skipNulls, tolerance)

  /** Nearest as-of: attach the right row minimizing |right.ts − ts|;
    * equal distances prefer the backward row. */
  def asofJoinNearest(
      right: TSDF,
      leftPrefix: Option[String] = None,
      rightPrefix: String = "right",
      tolerance: Option[Double] = None): TSDF =
    AsOfJoin.nearest(this, right, leftPrefix, rightPrefix, tolerance)

  def resample(freq: String, func: String, fill: Boolean = false,
      metricCols: Option[Seq[String]] = None, prefix: Option[String] = None): TSDF =
    Resample.aggregate(this, freq, func, fill, metricCols, prefix)

  def interpolate(
      method: String,
      freq: Option[String] = None,
      func: Option[String] = None,
      targetCols: Option[Seq[String]] = None,
      showInterpolated: Boolean = false): TSDF =
    Interpolation.interpolate(this, method, freq, func, targetCols, showInterpolated)

  def withRangeStats(
      colsToSummarize: Seq[String] = Seq.empty,
      rangeBackWindowSecs: Long = 1000): TSDF =
    Stats.withRangeStats(this, colsToSummarize, rangeBackWindowSecs)

  def withGroupedStats(metricCols: Seq[String] = Seq.empty, freq: String): TSDF =
    Stats.withGroupedStats(this, metricCols, freq)

  def vwap(frequency: String = "m", volumeCol: String = "volume",
      priceCol: String = "price"): TSDF =
    Stats.vwap(this, frequency, volumeCol, priceCol)

  def ema(colToCalc: String, window: Int = 30, expFactor: Double = 0.2): TSDF =
    Stats.ema(this, colToCalc, window, expFactor)

  def emaExact(colToCalc: String, alpha: Double): TSDF =
    Stats.emaExact(this, colToCalc, alpha)

  def holtExact(colToCalc: String, alpha: Double, beta: Double): TSDF =
    Stats.holtExact(this, colToCalc, alpha, beta)

  def kalmanLevel(colToCalc: String, q: Double, r: Double,
      p0: Option[Double] = None): TSDF =
    Stats.kalmanLevel(this, colToCalc, q, r, p0)

  def rsi(colToCalc: String, n: Int): TSDF =
    Stats.rsi(this, colToCalc, n)

  def ewmVolatility(colToCalc: String, alpha: Double): TSDF =
    Stats.ewmVolatility(this, colToCalc, alpha)

  def macd(colToCalc: String, fast: Int = 12, slow: Int = 26,
      signal: Int = 9): TSDF =
    Stats.macd(this, colToCalc, fast, slow, signal)

  def sessionize(gapSeconds: Long): TSDF =
    copy(df = Sessionize.assign(df, tsCol, partitionCols, gapSeconds))

  def withLookbackFeatures(featureCols: Seq[String], lookbackWindowSize: Int,
      exactSize: Boolean = true, featureColName: String = "features"): TSDF =
    Stats.withLookbackFeatures(this, featureCols, lookbackWindowSize, exactSize, featureColName)

  def extractStateIntervals(metricCols: Seq[String],
      stateDefinition: Either[String, (Column, Column) => Column] = Left("=")): DataFrame =
    Stats.extractStateIntervals(this, metricCols, stateDefinition)

  def calcBars(freq: String, metricCols: Seq[String] = Seq.empty): TSDF =
    Stats.calcBars(this, freq, metricCols)

  def fourierTransform(timestep: Double, valueCol: String): TSDF =
    Fourier.transform(this, timestep, valueCol)
}

/** Remembered resample parameters so chained interpolate() can default them
  * (_ResampledTSDF, tsdf.py:1619-1689). */
case class ResampleSpec(freq: String, func: String)

object TSDF {

  /** Reference-parity constructor: like the case-class ctor, but a
    * StringType ts column is proactively converted to the nano-precision
    * double epoch and replaces the original, exactly as the reference does
    * at construction (tsdf.py:35-77). Non-string ts columns pass through
    * untouched.
    *
    * Validation is scale-aware via `validate`:
    *  - `"full"`: a one-row sample checked against the reference's format
    *    regex for a first-class message, then a full `try_to_timestamp IS
    *    NULL` count so a malformed string ANYWHERE fails construction
    *    instead of silently parsing to null rows later (the reference has
    *    that silent-null behavior; this is deliberately stricter).
    *  - `"sample"`: only the one-row format check — one tiny job.
    *  - `"off"`: no validation job at all; malformed strings surface as
    *    null timestamps downstream, exactly like the reference.
    *  - `"auto"` (default): `"full"` when Catalyst's plan-size estimate
    *    (`optimizedPlan.stats.sizeInBytes`) is at most
    *    [[FullValidationMaxBytes]], else `"sample"` — so constructing over
    *    a 100 TB input never silently full-scans it before the first real
    *    query. */
  def of(df: DataFrame, tsCol: String, partitionCols: Seq[String] = Seq.empty,
      sequenceCol: Option[String] = None, validate: String = "auto"): TSDF = {
    df.schema.find(_.name.equalsIgnoreCase(tsCol)).map(_.dataType) match {
      case Some(StringType) =>
        val mode = validate match {
          case "auto" =>
            val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
            if (bytes <= BigInt(FullValidationMaxBytes)) "full" else "sample"
          case m @ ("full" | "sample" | "off") => m
          case other => throw new IllegalArgumentException(
            s"validate must be one of auto|full|sample|off, got '$other'")
        }
        if (mode != "off") {
          df.select(col(tsCol)).limit(1).collect().headOption
            .map(_.getString(0)).filter(_ != null).foreach { sample =>
              require(isValidTsString(sample),
                s"ts string column '$tsCol' is not 'YYYY-MM-DD[ T]HH:MM:SS[.f+]': $sample")
            }
        }
        if (mode == "full") {
          val bad = df.filter(col(tsCol).isNotNull &&
            try_to_timestamp(col(tsCol)).isNull).count()
          require(bad == 0,
            s"$bad row(s) of ts string column '$tsCol' fail to parse as timestamps")
        }
        // full mode proved every string parses, so the strict (ANSI-faulting)
        // conversion is safe; sample/off must tolerate malformed rows as
        // silent nulls, matching the reference's behavior
        val converted = parseNanosTimestamp(df, tsCol, "__parsed_ts",
          "__double_ts", lenient = mode != "full")
          .drop(tsCol, "__parsed_ts")
          .withColumnRenamed("__double_ts", tsCol)
        TSDF(converted, tsCol, partitionCols, sequenceCol)
      case _ => TSDF(df, tsCol, partitionCols, sequenceCol)
    }
  }

  /** `validate = "auto"` threshold: inputs whose Catalyst size estimate
    * exceeds this (4 GiB) get the sample check only — a constructor that
    * full-scans a cluster-scale input twice before the first query is a
    * scale trap, while below this a full scan is sub-second on any
    * executor fleet. */
  val FullValidationMaxBytes: Long = 4L << 30

  /** Nanosecond-precision string-timestamp ingestion.
    *
    * Spark timestamps are microsecond; to preserve nanos the reference keeps a
    * parallel double epoch column (tsdf.py:86-150). Same trick: seconds since
    * epoch from the truncated timestamp plus the full fractional part parsed
    * from the string.
    */
  def parseNanosTimestamp(df: DataFrame, tsStringCol: String,
      parsedTsCol: String = "parsed_ts", doubleTsCol: String = "double_ts",
      lenient: Boolean = false): DataFrame = {
    // lenient: malformed strings become null timestamps (and null double
    // epochs) instead of ANSI runtime faults — the reference's silent-null
    // ingestion; strings that DO parse convert identically in both modes
    val parsed =
      if (lenient) try_to_timestamp(col(tsStringCol))
      else to_timestamp(col(tsStringCol))
    val rawFrac = when(col(tsStringCol).contains("."),
      concat(lit("0."), split(col(tsStringCol), "\\.").getItem(1)))
      .otherwise(lit("0.0"))
    val frac =
      (if (lenient) when(col(parsedTsCol).isNotNull, rawFrac).otherwise(lit("0.0"))
       else rawFrac).cast(DoubleType)
    df.withColumn(parsedTsCol, parsed)
      .withColumn(doubleTsCol,
        col(parsedTsCol).cast(DoubleType).cast("long").cast(DoubleType) + frac)
  }

  /** Validate `YYYY-MM-DD[ T]HH:MM:SS[.fffffffff]` (tsdf.py:152-161). */
  private val TsPattern =
    """^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}(\.\d+)?$""".r
  def isValidTsString(s: String): Boolean = TsPattern.matches(s)
}
