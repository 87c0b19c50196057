package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.tsdf.Resample

/** Structured Streaming counterparts of the core time-series operators.
  *
  * The reference library is batch-only (no readStream/watermark anywhere in
  * it — SURVEY §2.9); these operators extend the same semantics to streams
  * the Spark-native way: event-time windows + watermarks for resampling and
  * grouped stats, and `flatMapGroupsWithState` for run-length state
  * tracking. Each batch operator's bucket/aggregate expressions are reused,
  * so a query can move batch→streaming without changing its semantics.
  */
object StreamingTSDF {

  /** Series-key separator: the ASCII unit separator (0x1f), which cannot appear in
    * normal identifiers. Joining on a space would collide ("a b", "c") with
    * ("a", "b c") and silently merge distinct series. Null series values are
    * not supported (they would shift key positions). */
  private val KeySep = "\u001f"

  private def seriesKey(seriesCols: Seq[String]): Column =
    concat_ws(KeySep, seriesCols.map(col(_).cast(StringType)): _*)

  /** Re-emit the original typed series columns from the packed `series` key,
    * casting each segment back to its type in the source schema. */
  private def typedSeriesCols(schema: StructType, seriesCols: Seq[String]): Seq[Column] =
    seriesCols.zipWithIndex.map { case (c, i) =>
      split(col("series"), KeySep, -1).getItem(i).cast(schema(c).dataType).alias(c)
    }

  /** Streaming resample: tumbling event-time buckets with a watermark.
    * `func ∈ {floor, mean, min, max, ceil}` with the same argmin/argmax
    * struct idiom as the batch operator; emits finalized buckets once the
    * watermark passes (append mode). */
  def resample(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      freq: String, func: String, watermarkDelay: String = "10 minutes"): DataFrame = {
    val spec = Resample.parseFreq(freq)
    val metrics = df.schema.fields
      .filterNot(f => f.name == tsCol || seriesCols.contains(f.name)).map(_.name).toSeq
    val grouped = df
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(seriesCols.map(col) :+ window(col(tsCol), spec.sparkInterval).alias("__w"): _*)
    val aggregated = func match {
      case Resample.Floor =>
        grouped.agg(min(struct((tsCol +: metrics).map(col): _*)).alias("__c"))
          .select(seriesCols.map(col) ++ (col("__w.start").alias(tsCol) +:
            metrics.map(m => col("__c").getField(m).alias(m))): _*)
      case Resample.Ceil =>
        grouped.agg(max(struct((tsCol +: metrics).map(col): _*)).alias("__c"))
          .select(seriesCols.map(col) ++ (col("__w.start").alias(tsCol) +:
            metrics.map(m => col("__c").getField(m).alias(m))): _*)
      case Resample.Mean | Resample.Min | Resample.Max =>
        val fn: String => Column = func match {
          case Resample.Mean => c => avg(col(c))
          case Resample.Min  => c => min(col(c))
          case Resample.Max  => c => max(col(c))
        }
        val numeric = df.schema.fields
          .filter(f => metrics.contains(f.name) && f.dataType.isInstanceOf[NumericType])
          .map(_.name).toSeq
        require(numeric.nonEmpty,
          s"streaming resample('$func') needs at least one numeric metric column " +
            s"beyond '$tsCol' and series ${seriesCols.mkString("[", ", ", "]")}")
        grouped.agg(fn(numeric.head).alias(numeric.head),
            numeric.tail.map(c => fn(c).alias(c)): _*)
          .select(seriesCols.map(col) ++ (col("__w.start").alias(tsCol) +:
            numeric.map(col)): _*)
      case other =>
        throw new IllegalArgumentException(s"unsupported streaming resample func '$other'")
    }
    aggregated
  }

  /** Streaming grouped stats: mean/count/min/max/sum per metric per tumbling
    * bucket, watermark-finalized. */
  def groupedStats(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      metricCols: Seq[String], freq: String,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(metricCols.nonEmpty, "streaming groupedStats needs at least one metric column")
    val spec = Resample.parseFreq(freq)
    val aggs = metricCols.flatMap { c =>
      val v = col(c)
      Seq(avg(v).alias(s"mean_$c"), count(v).alias(s"count_$c"),
        min(v).alias(s"min_$c"), max(v).alias(s"max_$c"), sum(v).alias(s"sum_$c"))
    }
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(seriesCols.map(col) :+ window(col(tsCol), spec.sparkInterval).alias("__w"): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn(tsCol, col("__w.start"))
      .drop("__w")
  }

  // ------------------------------------------------ streaming as-of join
  // not private: encoder-generated code must be able to access these
  case class AsOfEvent(series: String, tsUs: Long, side: Int, vals: Seq[Double],
      eventTime: java.sql.Timestamp)
  case class LastRight(tsUs: Long, vals: Seq[Double])
  case class AsOfOut(series: String, tsUs: Long, rightTsUs: Option[Long],
      rightVals: Option[Seq[Double]])

  /** Streaming as-of join: each left-stream row attaches the latest
    * right-stream observation with `right.ts <= left.ts` in its series
    * (ties resolve right-before-left, like the batch union path's rec_ind).
    *
    * Realization: the two streams union into one keyed stream; state per
    * series is ONE record — the latest right row seen (constant size, no
    * growing buffers). Rows within a micro-batch process in event-time
    * order; a right row that arrives after a later-ts left row was already
    * emitted does not rewrite the emitted answer — the documented
    * append-mode trade-off vs the batch operator (use watermarked batch
    * re-runs when exactness over late data matters).
    *
    * v1 contract: right-side payload is its numeric metric columns.
    *
    * `stateTtl` (optional): evict a series' state once the event-time
    * watermark passes its last right observation by the TTL — bounds total
    * state by the number of *active* series instead of all series ever
    * seen. Left rows arriving after eviction join to null (the same answer
    * a batch re-run over the retained window would give).
    */
  def asofJoin(left: DataFrame, right: DataFrame, tsCol: String,
      seriesCols: Seq[String], rightMetricCols: Seq[String],
      stateTtl: Option[String] = None): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    def keyed(df0: DataFrame, side: Int, vals: Seq[String]) = {
      // the watermark must be declared on a column that SURVIVES into the
      // stateful operator's input, so keep the raw timestamp alongside the
      // derived micros and watermark it after the projection
      val base = df0.select(
        seriesKey(seriesCols).alias("series"),
        unix_micros(col(tsCol)).alias("tsUs"),
        lit(side).alias("side"),
        array(vals.map(col(_).cast(DoubleType)): _*).alias("vals"),
        col(tsCol).alias("eventTime"))
      stateTtl.fold(base)(ttl => base.withWatermark("eventTime", ttl))
    }
    val unioned = keyed(left, 1, Seq.empty)
      .unionByName(keyed(right, -1, rightMetricCols))
      .as[AsOfEvent]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = unioned
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[AsOfEvent], state: GroupState[LastRight]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // right (-1) before left (1) at equal ts — inclusive as-of
            val sorted = rows.toSeq.sortBy(e => (e.tsUs, e.side))
            var last = state.getOption.orNull
            val outRows = Seq.newBuilder[AsOfOut]
            sorted.foreach { e =>
              if (e.side < 0) {
                if (last == null || e.tsUs >= last.tsUs) last = LastRight(e.tsUs, e.vals)
              } else {
                outRows += AsOfOut(key, e.tsUs,
                  Option(last).map(_.tsUs), Option(last).map(_.vals))
              }
            }
            if (last != null) {
              state.update(last)
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(last.tsUs / 1000, state.getCurrentWatermarkMs() + 1), ttl))
            }
            outRows.result().iterator
          }
      }
    val metricsOut = rightMetricCols.zipWithIndex.map { case (m, i) =>
      element_at(col("rightVals"), i + 1).alias(s"right_$m")
    }
    out.toDF()
      .select(typedSeriesCols(left.schema, seriesCols) ++
        (timestamp_micros(col("tsUs")).alias(tsCol) +:
          timestamp_micros(col("rightTsUs")).alias(s"right_$tsCol") +:
          metricsOut): _*)
  }

  /** Stream-stream tolerance join: each left row pairs with EVERY right row
    * of its series whose timestamp lies in [left.ts − tolerance, left.ts] —
    * the windowed relaxation of the as-of join (which keeps only the latest
    * such row), built on Spark's native watermarked stream-stream join so
    * state cleanup, late-data handling and scale-out come from the engine:
    * both sides shuffle once on the series key and right-side state is
    * dropped as the watermark passes `tolerance + delay`. Prefer this over
    * [[asofJoin]] when downstream wants all-matches (feature windows) or
    * when exact engine-managed state bounds matter more than latest-only
    * semantics. */
  def toleranceJoin(left: DataFrame, right: DataFrame, tsCol: String,
      seriesCols: Seq[String], rightMetricCols: Seq[String], tolerance: String,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val lw = left.withWatermark(tsCol, watermarkDelay).alias("l")
    val rw = right
      .select((seriesCols :+ tsCol).map(col) ++ rightMetricCols.map(col): _*)
      .withWatermark(tsCol, watermarkDelay).alias("r")
    val cond = seriesCols.map(c => col(s"l.$c") === col(s"r.$c")).reduce(_ && _) &&
      col(s"r.$tsCol") <= col(s"l.$tsCol") &&
      col(s"r.$tsCol") >= col(s"l.$tsCol") - expr(s"INTERVAL $tolerance")
    lw.join(rw, cond, "inner")
      .select(left.columns.toIndexedSeq.map(c => col(s"l.$c")) ++
        (col(s"r.$tsCol").alias(s"right_$tsCol") +:
          rightMetricCols.map(m => col(s"r.$m").alias(s"right_$m"))): _*)
  }

  // ------------------------------------------------ streaming EMA
  case class EmaEvent(series: String, tsUs: Long, value: Double,
      eventTime: java.sql.Timestamp)
  case class EmaState(ema: Double, lastTsUs: Long)

  /** Streaming exponential moving average: ema' = α·x + (1−α)·ema per
    * series, one double of state. This is the EXACT infinite-horizon
    * recursion — the batch operator approximates it with a 5-term lag
    * window (reference semantics), so the two converge as the window grows
    * but are not bit-equal by design. Rows inside a micro-batch process in
    * event-time order; a row arriving strictly older than the last
    * processed timestamp is DROPPED, not folded in — folding it would
    * rewind per-series state that on-time history already advanced (use a
    * watermark sized to the expected lateness if late rows must count).
    * Optional `stateTtl` evicts idle series. */
  def ema(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      valueCol: String, alpha: Double,
      stateTtl: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"),
      col(valueCol).cast(DoubleType).alias("value"),
      col(tsCol).alias("eventTime"))
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[EmaEvent]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[EmaEvent], state: GroupState[EmaState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var cur = state.getOption.orNull
            val outRows = sorted.flatMap { e =>
              if (cur != null && e.tsUs < cur.lastTsUs) None
              else {
                cur = if (cur == null) EmaState(e.value, e.tsUs)
                  else EmaState(alpha * e.value + (1 - alpha) * cur.ema, e.tsUs)
                Some((key, e.tsUs, e.value, cur.ema))
              }
            }
            if (cur != null) {
              state.update(cur)
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(cur.lastTsUs / 1000,
                  state.getCurrentWatermarkMs() + 1), ttl))
            }
            outRows.iterator
          }
      }
      .toDF("series", "tsUs", "value", "ema")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      timestamp_micros(col("tsUs")).alias(tsCol),
      col("value").alias(valueCol),
      col("ema").alias(s"ema_$valueCol")): _*)
  }

  case class EwmVarState(mean: Double, variance: Double, lastTsUs: Long)

  /** Streaming EW mean + variance: the [[graft.functions.EwmVarExact]]
    * recursion carried as two doubles of per-series state — bit-identical
    * to the batch window aggregate (same IEEE ops in the same order;
    * asserted differentially). Late rows are DROPPED (state cannot
    * rewind). Output: series + ts + value + `ewm_mean_<col>` +
    * `ewm_var_<col>`. */
  def ewmVolatility(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      valueCol: String, alpha: Double,
      stateTtl: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"),
      col(valueCol).cast(DoubleType).alias("value"),
      col(tsCol).alias("eventTime"))
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[EmaEvent]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[EmaEvent], state: GroupState[EwmVarState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var cur = state.getOption.orNull
            val outRows = sorted.flatMap { e =>
              if (cur != null && e.tsUs < cur.lastTsUs) None
              else {
                cur = if (cur == null) EwmVarState(e.value, 0.0, e.tsUs)
                else {
                  val d = e.value - cur.mean
                  EwmVarState(
                    alpha * e.value + (1 - alpha) * cur.mean,
                    (1 - alpha) * cur.variance + alpha * d * d * (1 - alpha),
                    e.tsUs)
                }
                Some((key, e.tsUs, e.value, cur.mean, cur.variance))
              }
            }
            if (cur != null) {
              state.update(cur)
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(cur.lastTsUs / 1000,
                  state.getCurrentWatermarkMs() + 1), ttl))
            }
            outRows.iterator
          }
      }
      .toDF("series", "tsUs", "value", "mean", "variance")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      timestamp_micros(col("tsUs")).alias(tsCol),
      col("value").alias(valueCol),
      col("mean").alias(s"ewm_mean_$valueCol"),
      col("variance").alias(s"ewm_var_$valueCol")): _*)
  }

  case class RsiState(avgGain: Double, avgLoss: Double, lastValue: Double,
      nMoves: Long, lastTsUs: Long)

  /** Streaming Wilder RSI (EMA-seeded, the [[graft.tsdf.Stats.rsi]]
    * variant): per-series state is the two EMA accumulators + the previous
    * value — bit-identical to the batch form (differentially asserted).
    * The first row of a series emits a null rsi (no move yet); late rows
    * are DROPPED. Output: series + ts + value + `rsi_<col>`. */
  def rsi(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      valueCol: String, n: Int,
      stateTtl: Option[String] = None): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val alpha = 1.0 / n
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"),
      col(valueCol).cast(DoubleType).alias("value"),
      col(tsCol).alias("eventTime"))
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[EmaEvent]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[EmaEvent], state: GroupState[RsiState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var cur = state.getOption.orNull
            val outRows = sorted.flatMap { e =>
              if (cur != null && e.tsUs < cur.lastTsUs) None
              else {
                cur = if (cur == null)
                  RsiState(0.0, 0.0, e.value, 0L, e.tsUs)
                else {
                  val d = e.value - cur.lastValue
                  val g = math.max(d, 0.0)
                  val l = math.max(-d, 0.0)
                  if (cur.nMoves == 0L)
                    RsiState(g, l, e.value, 1L, e.tsUs)
                  else RsiState(
                    alpha * g + (1 - alpha) * cur.avgGain,
                    alpha * l + (1 - alpha) * cur.avgLoss,
                    e.value, cur.nMoves + 1L, e.tsUs)
                }
                val rsi: java.lang.Double =
                  if (cur.nMoves == 0L || cur.avgGain + cur.avgLoss == 0.0)
                    null
                  else 100.0 * cur.avgGain / (cur.avgGain + cur.avgLoss)
                Some((key, e.tsUs, e.value, Option(rsi).map(_.doubleValue)))
              }
            }
            if (cur != null) {
              state.update(cur)
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(cur.lastTsUs / 1000,
                  state.getCurrentWatermarkMs() + 1), ttl))
            }
            outRows.iterator
          }
      }
      .toDF("series", "tsUs", "value", "rsi")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      timestamp_micros(col("tsUs")).alias(tsCol),
      col("value").alias(valueCol),
      col("rsi").alias(s"rsi_$valueCol")): _*)
  }

  case class MacdState(fast: Double, slow: Double, signal: Double,
      lastTsUs: Long)

  /** Streaming MACD: the three exact-EMA recursions of
    * [[graft.tsdf.Stats.macd]] carried as three doubles of per-series
    * state — bit-identical to the batch form (the signal EMA consumes the
    * just-updated fast−slow difference, exactly as the batch second window
    * pass consumes the materialized macd column). Late rows are DROPPED.
    * Output: series + ts + value + `macd_<col>` + `macd_signal_<col>` +
    * `macd_hist_<col>`. */
  def macd(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      valueCol: String, fast: Int = 12, slow: Int = 26, signal: Int = 9,
      stateTtl: Option[String] = None): DataFrame = {
    require(fast >= 1 && slow >= 1 && signal >= 1, "spans must be >= 1")
    val af = 2.0 / (fast + 1)
    val as = 2.0 / (slow + 1)
    val asig = 2.0 / (signal + 1)
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"),
      col(valueCol).cast(DoubleType).alias("value"),
      col(tsCol).alias("eventTime"))
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[EmaEvent]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[EmaEvent], state: GroupState[MacdState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var cur = state.getOption.orNull
            val outRows = sorted.flatMap { e =>
              if (cur != null && e.tsUs < cur.lastTsUs) None
              else {
                cur = if (cur == null) {
                  val f = e.value; val s = e.value
                  MacdState(f, s, f - s, e.tsUs)
                } else {
                  val f = af * e.value + (1 - af) * cur.fast
                  val s = as * e.value + (1 - as) * cur.slow
                  val m = f - s
                  MacdState(f, s, asig * m + (1 - asig) * cur.signal, e.tsUs)
                }
                val m = cur.fast - cur.slow
                Some((key, e.tsUs, e.value, m, cur.signal, m - cur.signal))
              }
            }
            if (cur != null) {
              state.update(cur)
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(cur.lastTsUs / 1000,
                  state.getCurrentWatermarkMs() + 1), ttl))
            }
            outRows.iterator
          }
      }
      .toDF("series", "tsUs", "value", "macd", "signal", "hist")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      timestamp_micros(col("tsUs")).alias(tsCol),
      col("value").alias(valueCol),
      col("macd").alias(s"macd_$valueCol"),
      col("signal").alias(s"macd_signal_$valueCol"),
      col("hist").alias(s"macd_hist_$valueCol")): _*)
  }

  case class PeakState(peak: Double, lastTsUs: Long)

  /** Streaming running peak + drawdown: one double of per-series state (the
    * high-water mark). Max is order-independent so the twin matches
    * [[graft.tsdf.Stats.drawdown]] bit-for-bit on raw doubles; rows inside
    * a micro-batch process in event-time order and a row strictly older
    * than the last processed timestamp is DROPPED (state cannot rewind —
    * same late-data contract as [[ema]]). Output: series + ts + value +
    * `peak_<col>` + `drawdown_<col>`. */
  def drawdown(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      valueCol: String, stateTtl: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"),
      col(valueCol).cast(DoubleType).alias("value"),
      col(tsCol).alias("eventTime"))
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[EmaEvent]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[EmaEvent], state: GroupState[PeakState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var cur = state.getOption.orNull
            val outRows = sorted.flatMap { e =>
              if (cur != null && e.tsUs < cur.lastTsUs) None
              else {
                cur = if (cur == null) PeakState(e.value, e.tsUs)
                  else PeakState(math.max(cur.peak, e.value), e.tsUs)
                Some((key, e.tsUs, e.value, cur.peak, cur.peak - e.value))
              }
            }
            if (cur != null) {
              state.update(cur)
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(cur.lastTsUs / 1000,
                  state.getCurrentWatermarkMs() + 1), ttl))
            }
            outRows.iterator
          }
      }
      .toDF("series", "tsUs", "value", "peak", "drawdown")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      timestamp_micros(col("tsUs")).alias(tsCol),
      col("value").alias(valueCol),
      col("peak").alias(s"peak_$valueCol"),
      col("drawdown").alias(s"drawdown_$valueCol")): _*)
  }

  case class HoltState(level: Double, trend: Double, lastTsUs: Long)

  /** Streaming Holt double-exponential smoothing: the level/trend recursion
    * of [[graft.functions.HoltExact]] carried as two doubles of per-series
    * state — bit-identical to the batch window aggregate on the same data
    * (same IEEE ops in the same order; asserted differentially). Rows
    * inside a micro-batch process in event-time order; a row strictly older
    * than the last processed timestamp is DROPPED (state cannot rewind —
    * see [[ema]]). Optional `stateTtl` evicts idle series. */
  def holt(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      valueCol: String, alpha: Double, beta: Double,
      stateTtl: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"),
      col(valueCol).cast(DoubleType).alias("value"),
      col(tsCol).alias("eventTime"))
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[EmaEvent]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[EmaEvent], state: GroupState[HoltState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var cur = state.getOption.orNull
            val outRows = sorted.flatMap { e =>
              if (cur != null && e.tsUs < cur.lastTsUs) None
              else {
                cur = if (cur == null) HoltState(e.value, 0.0, e.tsUs)
                  else {
                    val newLevel = alpha * e.value + (1 - alpha) * (cur.level + cur.trend)
                    HoltState(newLevel,
                      beta * (newLevel - cur.level) + (1 - beta) * cur.trend, e.tsUs)
                  }
                Some((key, e.tsUs, e.value, cur.level, cur.trend))
              }
            }
            if (cur != null) {
              state.update(cur)
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(cur.lastTsUs / 1000,
                  state.getCurrentWatermarkMs() + 1), ttl))
            }
            outRows.iterator
          }
      }
      .toDF("series", "tsUs", "value", "level", "trend")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      timestamp_micros(col("tsUs")).alias(tsCol),
      col("value").alias(valueCol),
      col("level").alias(s"holt_level_$valueCol"),
      col("trend").alias(s"holt_trend_$valueCol")): _*)
  }

  case class KalmanState(m: Double, p: Double, k: Double, lastTsUs: Long)

  /** Streaming 1-D local-level Kalman filter: the predict/update recursion
    * of [[graft.functions.KalmanExact]] carried as three doubles of
    * per-series state — bit-identical to the batch window aggregate on the
    * same data (same IEEE ops in the same order; asserted differentially).
    * Rows inside a micro-batch process in event-time order; a row strictly
    * older than the last processed timestamp is DROPPED (state cannot
    * rewind — see [[ema]]). Optional `stateTtl` evicts idle series. */
  def kalmanLevel(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      valueCol: String, q: Double, r: Double, p0: Option[Double] = None,
      stateTtl: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val initP = p0.getOrElse(r)
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"),
      col(valueCol).cast(DoubleType).alias("value"),
      col(tsCol).alias("eventTime"))
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[EmaEvent]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[EmaEvent], state: GroupState[KalmanState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var cur = state.getOption.orNull
            val outRows = sorted.flatMap { e =>
              if (cur != null && e.tsUs < cur.lastTsUs) None
              else {
                cur = if (cur == null) KalmanState(e.value, initP, 1.0, e.tsUs)
                  else {
                    val pPred = cur.p + q
                    val k = pPred / (pPred + r)
                    KalmanState(cur.m + k * (e.value - cur.m),
                      (1.0 - k) * pPred, k, e.tsUs)
                  }
                Some((key, e.tsUs, e.value, cur.m, cur.p, cur.k))
              }
            }
            if (cur != null) {
              state.update(cur)
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(cur.lastTsUs / 1000,
                  state.getCurrentWatermarkMs() + 1), ttl))
            }
            outRows.iterator
          }
      }
      .toDF("series", "tsUs", "value", "level", "variance", "gain")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      timestamp_micros(col("tsUs")).alias(tsCol),
      col("value").alias(valueCol),
      col("level").alias(s"kalman_level_$valueCol"),
      col("variance").alias(s"kalman_var_$valueCol"),
      col("gain").alias(s"kalman_gain_$valueCol")): _*)
  }

  case class RollMedState(recent: Seq[Double], lastTsUs: Long)

  /** Streaming rolling median over the trailing `window` observations per
    * series — bounded state (window−1 doubles per series), the streaming
    * twin of [[graft.tsdf.Stats.rollingMedian]] (same lower-median rank on
    * the same frame multiset, so bit-identical on the same data; asserted
    * differentially). Rows inside a micro-batch process in event-time
    * order; a row strictly older than the last processed timestamp is
    * DROPPED (state cannot rewind — see [[ema]]). Optional `stateTtl`
    * evicts idle series. */
  def rollingMedian(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      valueCol: String, window: Int,
      stateTtl: Option[String] = None): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"),
      col(valueCol).cast(DoubleType).alias("value"),
      col(tsCol).alias("eventTime"))
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[EmaEvent]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[EmaEvent], state: GroupState[RollMedState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var recent = state.getOption.map(_.recent.toVector).getOrElse(Vector.empty)
            var lastTs = state.getOption.map(_.lastTsUs).getOrElse(Long.MinValue)
            val outRows = sorted.flatMap { e =>
              if (e.tsUs < lastTs) None
              else {
                val frame = (recent :+ e.value).takeRight(window)
                val fs = frame.sorted
                val med = fs(math.max(1, math.ceil(fs.size / 2.0).toInt) - 1)
                recent = (recent :+ e.value).takeRight(window - 1)
                lastTs = e.tsUs
                Some((key, e.tsUs, e.value, med))
              }
            }
            if (outRows.nonEmpty || state.exists) {
              state.update(RollMedState(recent, lastTs))
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(lastTs / 1000,
                  state.getCurrentWatermarkMs() + 1), ttl))
            }
            outRows.iterator
          }
      }
      .toDF("series", "tsUs", "value", "med")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      timestamp_micros(col("tsUs")).alias(tsCol),
      col("value").alias(valueCol),
      col("med").alias(s"rolling_median_$valueCol")): _*)
  }

  case class GapState(lastTsUs: Long)

  /** Streaming observation-gap detector: emits one row per inter-event hole
    * longer than `minGapSeconds`, per series — one long of state (the last
    * seen timestamp), the streaming twin of [[graft.tsdf.Stats.gaps]]
    * (asserted differentially). The gap row emits when the closing event
    * arrives. A row strictly older than the last processed timestamp is
    * DROPPED (state cannot rewind — see [[ema]]). Optional `stateTtl`
    * evicts idle series — note an evicted
    * series forgets its last timestamp, so a hole spanning the eviction is
    * not reported (the TTL bounds both state and lookback by design). */
  def gaps(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      minGapSeconds: Long, stateTtl: Option[String] = None): DataFrame = {
    require(minGapSeconds >= 0, "minGapSeconds must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"),
      lit(0.0).alias("value"),
      col(tsCol).alias("eventTime"))
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[EmaEvent]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val minGapUs = minGapSeconds * 1000000L
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[EmaEvent], state: GroupState[GapState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var last = state.getOption.map(_.lastTsUs)
            val outRows = sorted.flatMap { e =>
              // a row strictly older than the processed history is dropped:
              // folding it in would rewind `last`, and the next on-time row
              // could then report a gap that on-time history already closed
              if (last.exists(e.tsUs < _)) None
              else {
                val gap = last.filter(l => e.tsUs - l > minGapUs)
                  .map(l => (key, l, e.tsUs))
                last = Some(e.tsUs)
                gap
              }
            }
            last.foreach { l =>
              state.update(GapState(l))
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(l / 1000, state.getCurrentWatermarkMs() + 1), ttl))
            }
            outRows.iterator
          }
      }
      .toDF("series", "startUs", "endUs")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      timestamp_micros(col("startUs")).alias("gap_start"),
      timestamp_micros(col("endUs")).alias("gap_end"),
      ((col("endUs") - col("startUs")) / lit(1000000L)).alias("gap_seconds")): _*)
  }

  case class CusumEvent(series: String, tsUs: Long, value: Long)
  case class CusumState(sumHi: Long, minHi: Long, sumLo: Long, minLo: Long,
      lastTsUs: Long)

  /** Streaming Page's CUSUM control chart: the sequential drift detector
    * [[graft.tsdf.Stats.cusumControl]] as four longs of per-series state —
    * the prefix sum and its running minimum for each side, which the
    * reflection identity S_t = P_t − min(0, min_j P_j) turns into the
    * clamped CUSUM recursion with no recomputation. Exact integer
    * arithmetic end to end, so the stream is bit-identical to the batch
    * window plan on the same data (asserted differentially). Rows inside
    * a micro-batch process in event-time order; a row strictly older than
    * the last processed timestamp is DROPPED (state cannot rewind — see
    * [[ema]]). Optional `stateTtl` evicts idle series (an evicted series
    * restarts its chart from zero — TTL bounds state by design). */
  def cusumControl(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      valueCol: String, target: Long, slack: Long, threshold: Long,
      stateTtl: Option[String] = None): DataFrame = {
    require(slack >= 0, "slack must be >= 0")
    require(threshold > 0, "threshold must be > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"),
      graft.tsdf.Stats.integralOrFail(col(valueCol), "cusumControl")
        .alias("value"),
      col(tsCol).alias("eventTime"))
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[CusumEvent]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[CusumEvent], state: GroupState[CusumState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var cur = state.getOption.orNull
            val outRows = sorted.flatMap { e =>
              if (cur != null && e.tsUs < cur.lastTsUs) None
              else {
                val pHi = (if (cur == null) 0L else cur.sumHi) +
                  (e.value - target - slack)
                val pLo = (if (cur == null) 0L else cur.sumLo) +
                  (target - slack - e.value)
                val mHi = if (cur == null) pHi else math.min(cur.minHi, pHi)
                val mLo = if (cur == null) pLo else math.min(cur.minLo, pLo)
                cur = CusumState(pHi, mHi, pLo, mLo, e.tsUs)
                val sHi = pHi - math.min(0L, mHi)
                val sLo = pLo - math.min(0L, mLo)
                Some((key, e.tsUs, e.value, sHi, sLo,
                  sHi > threshold || sLo > threshold))
              }
            }
            if (cur != null) {
              state.update(cur)
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(cur.lastTsUs / 1000,
                  state.getCurrentWatermarkMs() + 1), ttl))
            }
            outRows.iterator
          }
      }
      .toDF("series", "tsUs", "value", "cusumHi", "cusumLo", "alert")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      timestamp_micros(col("tsUs")).alias(tsCol),
      col("value").alias(valueCol),
      col("cusumHi").alias("cusum_hi"),
      col("cusumLo").alias("cusum_lo"),
      col("alert")): _*)
  }

  /** Streaming VWAP: volume-weighted average price per tumbling event-time
    * bucket, watermark-finalized — the streaming face of the batch `vwap`
    * operator (one partial+final aggregate, map-side combinable sums). */
  def vwap(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      priceCol: String, volumeCol: String, freq: String,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val spec = Resample.parseFreq(freq)
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(seriesCols.map(col) :+ window(col(tsCol), spec.sparkInterval).alias("__w"): _*)
      .agg(
        (sum(col(priceCol) * col(volumeCol)) / sum(col(volumeCol))).alias("vwap"),
        max(col(priceCol)).alias(s"max_$priceCol"),
        sum(col(volumeCol)).alias(s"sum_$volumeCol"))
      .withColumn(tsCol, col("__w.start"))
      .drop("__w")
  }

  /** Streaming min-max downsample: per (series, tumbling bucket) the rows
    * attaining the bucket min and max of `valueCol`, watermark-finalized —
    * the streaming face of [[graft.tsdf.Resample.downsampleMinMax]] (same
    * argmin/argmax struct idiom and (value, ts) tie-break; asserted
    * differentially). ≤ 2 output rows per bucket regardless of input rate. */
  def downsampleMinMax(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      freq: String, valueCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val spec = Resample.parseFreq(freq)
    val cols = df.columns.toIndexedSeq
    val payload = struct(cols.map(col): _*)
    val key = struct(col(valueCol), col(tsCol))
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(seriesCols.map(col) :+ window(col(tsCol), spec.sparkInterval).alias("__w"): _*)
      .agg(min_by(payload, key).alias("__lo"), max_by(payload, key).alias("__hi"))
      .select(col("__w.start").alias("bucket_ts"),
        explode(array_distinct(array(col("__lo"), col("__hi")))).alias("__r"))
      .select(col("bucket_ts") +: cols.map(c => col(s"__r.$c")): _*)
  }

  /** Streaming sessionization: per-series session aggregates via Spark's
    * native `session_window` (dynamic-gap event-time windows) — sessions
    * close and emit once the watermark passes `gap` past their last event.
    * The streaming face of [[graft.tsdf.Sessionize.intervals]] (equality
    * asserted differentially on random series). */
  def sessionIntervals(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      gap: String, watermarkDelay: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(seriesCols.map(col) :+ session_window(col(tsCol), gap).alias("__w"): _*)
      .agg(min(col(tsCol)).alias("session_start"),
        max(col(tsCol)).alias("session_end"),
        count(lit(1)).alias("n_events"))
      .drop("__w")

  /** Streaming exact dedup on a normalized-text fingerprint: the streaming
    * face of `Dedup.exactNormalized`. State per fingerprint is bounded by
    * the watermark (`dropDuplicatesWithinWatermark`): two copies arriving
    * within `watermarkDelay` of each other dedup; state older than the
    * watermark is evicted — the standard at-scale trade of exactness-
    * forever vs bounded state. Emits the first-seen row per fingerprint. */
  def dedupNormalized(df: DataFrame, tsCol: String, textCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    df.withColumn("__fp", md5(graft.pipeline.Dedup.normalizeText(col(textCol))))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  // ------------------------------------------------ streaming HLL registers
  case class HllEvent(series: String, bucket: Long, rho: Int,
      eventTime: java.sql.Timestamp)
  case class HllRegState(regs: Array[Int])

  /** Streaming HyperLogLog register build: per series, a register
    * CHANGELOG whose `max(register) per (series, bucket)` rollup at ANY
    * point reconstructs the exact batch
    * [[graft.pipeline.Sketch.hllRegisters]] file of everything ingested
    * so far; [[graft.pipeline.Sketch.hllEstimate]] then reads
    * distinct-count estimates from the rollup. The cell coordinates come
    * from the shared [[graft.pipeline.Sketch.hllCells]] expressions, so
    * batch and stream sketches are bit-identical by construction.
    *
    * Without `stateTtl` the emission is a stateless per-partition
    * pre-aggregation (each (partition, batch) emits its own per-bucket
    * max rho — max is idempotent and commutative, so the rollup is exact
    * for any partitioning; no exchange, no state stores — the
    * [[histogramDeltas]] discipline). With `stateTtl` the keyed stateful
    * form runs instead: m ints of state per series, merge-free,
    * watermark-evicted — eviction genuinely requires remembered state.
    * Late rows are harmless either way (a register can only be raised,
    * never needs rewinding). */
  def hllRegisters(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      itemCol: Column, bucketBits: Int = 6, seed: Int = 29,
      stateTtl: Option[String] = None, wide: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = 1 << bucketBits
    // `wide` selects the ~60-bit CRT-pair family (cells from the SAME
    // shared hllCells expressions the batch builder uses, so batch and
    // stream cannot drift) — required when a series' distinct count can
    // approach the narrow family's ~10⁹ ceiling; read the rollup with
    // hllEstimate(..., wide = true).
    val (bucket, rho) =
      graft.pipeline.Sketch.hllCells(itemCol, bucketBits, seed, wide)
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      bucket.alias("bucket"), rho.cast(IntegerType).alias("rho"),
      col(tsCol).alias("eventTime"))
      .filter(col("bucket").isNotNull) // null items carry no cell
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[HllEvent]
    // Without a TTL the changelog needs NO cross-batch state for the
    // rollup to be exact: the sink fold is max(register), and max is
    // idempotent and commutative, so emitting each PARTITION's per-batch
    // maxima (a stateless map-side combine — no exchange, no sort, no
    // state stores) max-folds to the identical register file for any
    // partitioning and any micro-batch split. The keyed stateful form
    // below survives only for the TTL path, whose eviction semantics
    // genuinely require remembered state.
    val out = (if (stateTtl.isEmpty)
      events.mapPartitions { it =>
        val regs = scala.collection.mutable.SortedMap.empty[(String, Int), Int]
        it.foreach { e =>
          val k = (e.series, e.bucket.toInt)
          val cur = regs.getOrElse(k, 0)
          if (e.rho > cur) regs(k) = e.rho
        }
        regs.iterator.map { case ((s, b), r) => (s, b.toLong, r) }
      }
    else events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[HllEvent], state: GroupState[HllRegState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val regs = state.getOption.map(_.regs).getOrElse(new Array[Int](m))
            val changed = scala.collection.mutable.SortedSet.empty[Int]
            var maxTsMs = Long.MinValue
            rows.foreach { e =>
              val b = e.bucket.toInt
              if (e.rho > regs(b)) { regs(b) = e.rho; changed += b }
              maxTsMs = math.max(maxTsMs, e.eventTime.getTime)
            }
            state.update(HllRegState(regs))
            stateTtl.foreach(ttl => state.setTimeoutTimestamp(
              math.max(maxTsMs, state.getCurrentWatermarkMs() + 1), ttl))
            changed.iterator.map(b => (key, b.toLong, regs(b)))
          }
      })
      .toDF("series", "bucket", "register")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      col("bucket"), col("register")): _*)
  }

  // ----------------------------------------------- streaming KMV k-min
  case class KmvEvent(series: String, h: Long)

  /** Streaming KMV k-min build: per series, each (input partition,
    * micro-batch) emits ITS OWN k smallest distinct item hashes — a
    * stateless per-partition pre-aggregation (the [[histogramDeltas]]
    * discipline: no exchange, no sort, no state stores).
    * Reconstruction invariant: a member of the FINAL global k-min set
    * has fewer than k distinct hashes below it anywhere, hence fewer
    * than k below it inside any (partition, batch) that carries it — so
    * every final member is emitted, the sink holds a superset of the
    * final set, and re-taking the k smallest distinct over it —
    * [[graft.pipeline.Sketch.kmvFromHashes]], the same aggregate the
    * batch builder uses — reproduces the batch
    * [[graft.pipeline.Sketch.kmvDistinct]] answer EXACTLY, for any
    * partitioning and any micro-batch split. Hashes come from the shared
    * engine-agnostic [[graft.pipeline.Hashing]] family, so the folded
    * readout still replays in a SQL oracle.
    *
    * The in-flight buffer is ≤ k longs per series per partition — the
    * streaming face of the bounded [[graft.functions.KMinDistinctAgg]]
    * buffer. Emission volume per (partition, batch) is ≤ k per series.
    * Documents carry no event time here; the per-bucket trailing variant
    * is the place for watermark/ttl semantics. */
  def kmvMins(df: DataFrame, seriesCols: Seq[String], itemCol: Column,
      k: Int, seed: Int = 17, wide: Boolean = false): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    // `wide` = the ~60-bit CRT-pair family, same expressions as the batch
    // kmvDistinct(wide = true) path — the k-min/changelog logic below is
    // hash-agnostic, so parity is by construction; fold the sink with
    // kmvFromHashes(..., space = Hashing.PW).
    val h =
      if (wide) graft.pipeline.Hashing.mixWide(
        graft.pipeline.Hashing.wideHash(itemCol), seed)
      else graft.pipeline.Hashing.mix(
        graft.pipeline.Hashing.polyHash(itemCol), seed)
    val events = df.select(
      seriesKey(seriesCols).alias("series"), h.alias("h"))
      .filter(col("h").isNotNull).as[KmvEvent]
    // Stateless per-PARTITION k-min emission — no exchange, no sort, no
    // state stores. Superset invariant, per partition: a member of the
    // FINAL global k-min set has fewer than k distinct hashes below it
    // anywhere, hence fewer than k below it inside any partition's batch
    // that contains it — so every final member is emitted by whichever
    // (partition, batch) first carries it, the sink holds a superset of
    // the final set, and the k-min re-fold ([[graft.pipeline.Sketch
    // .kmvFromHashes]], which takes the k smallest DISTINCT) reproduces
    // the batch sketch exactly for any partitioning and any micro-batch
    // split. A hash re-emitted by a later batch or a sibling partition is
    // excess the re-fold trims — the same slack the old changelog already
    // carried for evicted entries.
    val out = events
      .mapPartitions { it =>
        val sets =
          scala.collection.mutable.SortedMap.empty[String, java.util.TreeSet[java.lang.Long]]
        it.foreach { e =>
          val set = sets.getOrElseUpdate(e.series,
            new java.util.TreeSet[java.lang.Long]())
          val v = e.h
          if (!set.contains(v)) {
            if (set.size < k) set.add(v)
            else if (v < set.last()) { set.add(v); set.pollLast() }
          }
        }
        sets.iterator.flatMap { case (s, set) =>
          import scala.jdk.CollectionConverters._
          set.iterator().asScala.map(v => (s, v.longValue()))
        }
      }
      .toDF("series", "h")
    out.select(typedSeriesCols(df.schema, seriesCols) :+ col("h"): _*)
  }

  // ----------------------------------------------- streaming histogram
  case class HistEvent(series: String, bin: Long,
      eventTime: java.sql.Timestamp)

  /** Streaming histogram-sketch feed: per micro-batch, the exact bin
    * counts of the batch's rows per series — COUNT DELTAS, so a plain
    * `sum(cnt) per (series, bin)` over the sink reconstructs the exact
    * [[graft.pipeline.Sketch.histogram]] of everything ingested (counts
    * are additive; the rollup at any point is the sketch so far, and
    * [[graft.pipeline.Sketch.histQuantiles]] reads quantiles from it).
    * Bins come from the shared [[graft.pipeline.Sketch.histBin]]
    * expression, so batch and stream cannot drift. The operator carries
    * NO cross-batch state (deltas need none) — it is a stateless
    * per-partition pre-aggregation; nothing is stored, nothing can
    * leak. */
  def histogramDeltas(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      valueCol: Column, lo: Double, hi: Double, nBins: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      graft.pipeline.Sketch.histBin(valueCol, lo, hi, nBins).alias("bin"),
      col(tsCol).alias("eventTime"))
      .filter(col("bin").isNotNull).as[HistEvent]
    // Stateless per-PARTITION pre-aggregation (map-side combine), not a
    // keyed stateful operator: deltas are additive, so per-partition
    // per-batch counts fold to the identical grid for any partitioning
    // and any micro-batch split — and the stream plan drops its only
    // exchange, its sort and its state-store instances (commit cost per
    // partition per micro-batch). Sorted emission keeps the output
    // deterministic per input partition (task-retry safe).
    val out = projected
      .mapPartitions { it =>
        val acc = scala.collection.mutable.SortedMap.empty[(String, Long), Long]
        it.foreach { e =>
          val k = (e.series, e.bin)
          acc(k) = acc.getOrElse(k, 0L) + 1L
        }
        acc.iterator.map { case ((s, b), c) => (s, b, c) }
      }
      .toDF("series", "bin", "cnt")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      col("bin"), col("cnt")): _*)
  }

  // ----------------------------------------------- streaming count-min
  case class CmsEvent(series: String, row: Long, bucket: Long)

  /** Streaming Count-Min feed: per micro-batch, the exact per-cell hit
    * counts of the batch's items per series — COUNT DELTAS, so a plain
    * `sum(cnt) per (series, row, bucket)` over the sink reconstructs the
    * exact [[graft.pipeline.Sketch.cmsBuild]] grid of everything ingested
    * (CMS counters are additive), readable with the unchanged batch
    * [[graft.pipeline.Sketch.cmsEstimate]]. Addresses come from the shared
    * [[graft.pipeline.Sketch.cmsAddresses]] expressions (narrow or `wide`
    * CRT-pair family), so batch and stream cannot drift and the folded
    * readout replays in the same SQL oracle as the batch sketch.
    *
    * Deltas are emitted per INPUT PARTITION per batch (a stateless
    * map-side combine — the [[histogramDeltas]] discipline): additivity
    * makes the fold exact for any partitioning, parallelism follows the
    * ingest partitions, and the stream plan carries no exchange and no
    * state stores. No cross-batch state is needed (deltas carry none).
    * Null items carry no cells (same convention as [[hllRegisters]]). */
  def cmsDeltas(df: DataFrame, seriesCols: Seq[String], itemCol: Column,
      width: Int, depth: Int, seed: Int = 53,
      wide: Boolean = false): DataFrame = {
    require(width >= 2 && depth >= 1, "need width >= 2, depth >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      explode(graft.pipeline.Sketch.cmsAddresses(
        itemCol, width, depth, seed, wide)).alias("__a"))
      .select(col("series"), col("__a.row").alias("row"),
        col("__a.bucket").alias("bucket"))
      .filter(col("bucket").isNotNull)
      .as[CmsEvent]
    // Stateless per-PARTITION pre-aggregation (the histogramDeltas
    // discipline): counter deltas are additive, so per-partition
    // per-batch cell counts sum-fold to the identical CMS grid for any
    // partitioning and any micro-batch split — no exchange, no sort, no
    // state stores; parallelism comes from the input partitions instead
    // of salt groups. Sorted emission keeps output deterministic per
    // input partition (task-retry safe).
    val out = projected
      .mapPartitions { it =>
        val acc =
          scala.collection.mutable.SortedMap.empty[(String, Long, Long), Long]
        it.foreach { e =>
          val k = (e.series, e.row, e.bucket)
          acc(k) = acc.getOrElse(k, 0L) + 1L
        }
        acc.iterator.map { case ((s, r, b), c) => (s, r, b, c) }
      }
      .toDF("series", "row", "bucket", "cnt")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      col("row"), col("bucket"), col("cnt")): _*)
  }

  // ----------------------------------------------- streaming Bloom filter
  case class BloomEvent(series: String, word: Long, mask: Long)

  /** Streaming Bloom filter build: per series, the filter's set bits
    * emitted as a CHANGELOG — each (input partition, micro-batch) emits,
    * per 31-bit word, one row holding the OR of the masks it saw. Set
    * bits are idempotent under OR, so `bit_or(mask) per (series, word)`
    * over the sink reconstructs the batch
    * [[graft.pipeline.Sketch.bloomBuild]] filter exactly, for any
    * partitioning and any micro-batch split — probed with the unchanged
    * batch [[graft.pipeline.Sketch.bloomProbe]], replayed by the same SQL
    * oracle. Addresses come from the shared
    * [[graft.pipeline.Sketch.bloomAddresses]] expressions (narrow or
    * `wide`).
    *
    * The emission is a stateless per-partition pre-aggregation (the
    * [[histogramDeltas]] discipline): no exchange, no sort, no state
    * stores — the filter's footprint (≤ m/31 word rows per series per
    * partition per batch) bounds both the in-flight map and the sink
    * traffic. NOTE the fold is bitwise OR, not sum: a (series, word, bit)
    * may be emitted by several (partition, batch) pairs (the stateful
    * emit-once form this replaced allowed a sum fold; the folded filter
    * is bit-identical either way). Null items carry no bits. */
  def bloomBits(df: DataFrame, seriesCols: Seq[String], itemCol: Column,
      mBits: Int, depth: Int, seed: Int = 97,
      wide: Boolean = false): DataFrame = {
    require(mBits >= graft.pipeline.Sketch.BloomBitsPerWord && depth >= 1,
      s"need mBits >= 31, depth >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      explode(graft.pipeline.Sketch.bloomAddresses(
        itemCol, mBits, depth, seed, wide)).alias("__a"))
      .select(col("series"), col("__a.word").alias("word"),
        col("__a.mask").alias("mask"))
      .filter(col("word").isNotNull)
      .as[BloomEvent]
    // Stateless per-PARTITION pre-aggregation (the histogramDeltas
    // discipline): each partition emits, per (series, word), the OR of
    // the masks it saw in the batch. Set bits are idempotent under OR,
    // so a `bit_or(mask) per (series, word)` fold over the sink IS the
    // filter for any partitioning and any micro-batch split — no
    // exchange, no sort, no state stores. NOTE the fold is bitwise OR,
    // not sum: a (series, word, bit) may now be emitted by several
    // (partition, batch) pairs, so the old emit-once/sum contract no
    // longer holds (the filter itself is unchanged bit-for-bit).
    val out = projected
      .mapPartitions { it =>
        val words = scala.collection.mutable.SortedMap.empty[(String, Long), Long]
        it.foreach { e =>
          val k = (e.series, e.word)
          words(k) = words.getOrElse(k, 0L) | e.mask
        }
        words.iterator.map { case ((s, w), m) => (s, w, m) }
      }
      .toDF("series", "word", "mask")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      col("word"), col("mask")): _*)
  }

  // ----------------------------------------------- streaming keyed sums
  case class SumEvent(series: String, key: Long, v: Long)

  /** Streaming keyed-sum feed: per micro-batch, the exact integer SUM
    * DELTAS of `valueCol` per (series, key) — sums are additive, so a
    * plain `sum(s) per (series, key)` over the sink reconstructs the
    * exact batch grouped sum of everything ingested, for any micro-batch
    * split. This is the generic additive building block behind profile
    * maintenance on a stream: any downstream shape built from grouped
    * integer sums (hour-of-day profiles for DTW, per-bucket masses,
    * count grids via `valueCol = 1`) folds from the sink without
    * rescanning history. No cross-batch state is carried (deltas need
    * none — the emission is a stateless per-partition pre-aggregation,
    * the [[histogramDeltas]] discipline); sink traffic per batch is the
    * number of DISTINCT (series, key) cells touched per partition, not
    * the row count. Null keys and null values carry nothing. */
  def sumDeltas(df: DataFrame, seriesCols: Seq[String], keyCol: Column,
      valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      keyCol.cast(LongType).alias("key"),
      valueCol.cast(LongType).alias("v"))
      .filter(col("key").isNotNull && col("v").isNotNull)
      .as[SumEvent]
    // Stateless per-PARTITION pre-aggregation (the histogramDeltas
    // discipline): sums are additive, so per-partition per-batch deltas
    // fold identically for any partitioning and any micro-batch split.
    val out = projected
      .mapPartitions { it =>
        val acc = scala.collection.mutable.SortedMap.empty[(String, Long), Long]
        it.foreach { e =>
          val k = (e.series, e.key)
          acc(k) = acc.getOrElse(k, 0L) + e.v
        }
        acc.iterator.map { case ((s, k), v) => (s, k, v) }
      }
      .toDF("series", "key", "s")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      col("key"), col("s")): _*)
  }

  // ------------------------------------------- streaming survival grid
  case class KmEvent(series: String, t: Long, ev: Boolean)

  /** Additive Kaplan–Meier grid deltas: per micro-batch, per (series,
    * duration t), the event count Δd and total observation count Δobs —
    * both plain sums, so the folded sink equals the batch (group, t)
    * grid for ANY micro-batching, and
    * [[graft.pipeline.Analytics.kaplanMeierFromGrid]] lands on the
    * identical curve (risk sets and the survival fold are pure
    * functions OF THE GRID). Same contract class as [[sumDeltas]]:
    * stateless per batch, sink traffic = touched (series, t) cells. */
  def kmDeltas(df: DataFrame, seriesCols: Seq[String],
      durationCol: Column, eventCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      durationCol.cast(LongType).alias("t"),
      eventCol.alias("ev"))
      .filter(col("t").isNotNull && col("ev").isNotNull)
      .as[KmEvent]
    // Stateless per-PARTITION pre-aggregation (the histogramDeltas
    // discipline): grid cells are additive, so per-partition per-batch
    // deltas fold identically for any partitioning and micro-batching.
    val out = projected
      .mapPartitions { it =>
        val acc =
          scala.collection.mutable.SortedMap.empty[(String, Long), (Long, Long)]
        it.foreach { e =>
          val k = (e.series, e.t)
          val (d, o) = acc.getOrElse(k, (0L, 0L))
          acc(k) = (d + (if (e.ev) 1L else 0L), o + 1L)
        }
        acc.iterator.map { case ((s, t), (d, o)) => (s, t, d, o) }
      }
      .toDF("series", "t", "d", "obs")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      col("t"), col("d"), col("obs")): _*)
  }

  // --------------------------------------------- streaming novelty gate
  case class NoveltyFp(fp: Long, doc: Long)
  case class NoveltyFpT(fp: Long, doc: Long, eventTime: java.sql.Timestamp)

  /** Ingest-time first-occurrence novelty gate — the streaming face of
    * [[graft.pipeline.TextAnalysis.winnowNovelty]], the dedup-priority
    * operator a real ingestion pipeline runs: state per winnow
    * fingerprint is its FIRST owner's id, and every arriving document's
    * (doc, fp) rows are emitted with a `novel` flag (this doc owns the
    * fingerprint first). The per-doc score is then a stateless fold over
    * the sink — `n_novel / n_fps` per doc, exactly the batch formula.
    *
    * Ownership semantics: first ARRIVAL wins; within a micro-batch ties
    * break to the minimum id. Batch winnowNovelty's min-id "first owner"
    * is its ingestion-order proxy, so stream == batch EXACTLY whenever
    * ingestion order is nondecreasing in id (any batching, any order
    * WITHIN a batch) — the single-micro-batch AvailableNow harness and
    * the id-ordered multi-batch differential both sit inside that
    * contract. A smaller id arriving after its fingerprint was claimed
    * scores as non-novel — the honest ingest-time answer.
    *
    * Scale shape: the winnow selection is the same stateless scan-local
    * expression as the batch operator (no pair face, no all-pairs);
    * state is ONE long per distinct fingerprint, merge-free; the only
    * shuffle is the groupByKey on fp — the same key the batch first-owner
    * aggregate shuffles on. The per-(fp, batch) doc set materialized in
    * the group function is bounded by the fingerprint's document
    * frequency within the batch (the bounded-by-semantics per-group
    * contract class). Ids must be castable to long.
    *
    * State lifecycle: with the defaults, ownership is remembered FOREVER
    * (NoTimeout) — state grows with the distinct-fingerprint universe,
    * the correct gate for a bounded corpus build. For unbounded rolling
    * ingestion pass `stateTtl` + `eventTimeCol` (the [[asofJoin]]
    * convention): a fingerprint's ownership is evicted once the
    * event-time watermark passes its LAST sighting by the TTL — the
    * corpus-rotation horizon — after which the next arrival re-claims it
    * as novel (the answer a batch re-run over the retained window would
    * give). Total state is then bounded by the fingerprints ACTIVE
    * within one TTL horizon instead of all fingerprints ever seen. */
  def noveltyOwnership(df: DataFrame, textCol: String, idCol: String,
      k: Int = 5, w: Int = 4, stateTtl: Option[String] = None,
      eventTimeCol: Option[String] = None): DataFrame = {
    require(stateTtl.isDefined == eventTimeCol.isDefined,
      "stateTtl and eventTimeCol come together (event-time TTL eviction)")
    val spark = df.sparkSession
    import spark.implicits._
    if (stateTtl.isEmpty) {
      val fps = graft.pipeline.TextAnalysis.winnowFingerprints(
          df, textCol, idCol, k, w)
        .select(col("fp"), col(idCol).cast(LongType).alias("doc"))
        .as[NoveltyFp]
      fps.groupByKey(_.fp)
        .flatMapGroupsWithState(OutputMode.Append(),
          GroupStateTimeout.NoTimeout()) {
          (fp: Long, rows: Iterator[NoveltyFp], state: GroupState[Long]) =>
            val docs = rows.map(_.doc).toSet
            if (docs.isEmpty) Iterator.empty
            else {
              val owner =
                if (state.exists) state.get
                else { val m = docs.min; state.update(m); m }
              docs.iterator.map(d => (d, fp, d == owner))
            }
        }
        .toDF(idCol, "fp", "novel")
    } else {
      val ttl = stateTtl.get
      val fps = graft.pipeline.TextAnalysis.winnowFingerprints(
          df, textCol, idCol, k, w, carryCols = Seq(eventTimeCol.get))
        .select(col("fp"), col(idCol).cast(LongType).alias("doc"),
          col(eventTimeCol.get).alias("eventTime"))
        .withWatermark("eventTime", ttl)
        .as[NoveltyFpT]
      fps.groupByKey(_.fp)
        .flatMapGroupsWithState(OutputMode.Append(),
          GroupStateTimeout.EventTimeTimeout()) {
          (fp: Long, rows: Iterator[NoveltyFpT], state: GroupState[Long]) =>
            if (state.hasTimedOut) {
              state.remove() // ownership forgotten past the rotation horizon
              Iterator.empty
            } else {
              val batch = rows.toArray
              if (batch.isEmpty) Iterator.empty
              else {
                val docs = batch.map(_.doc).toSet
                val owner =
                  if (state.exists) state.get
                  else { val m = docs.min; state.update(m); m }
                // keep-alive: eviction clock restarts at the fp's LAST
                // sighting (floor-clamped above the current watermark,
                // the asofJoin convention)
                val lastMs = batch.map(_.eventTime.getTime).max
                state.setTimeoutTimestamp(
                  math.max(lastMs, state.getCurrentWatermarkMs() + 1), ttl)
                docs.iterator.map(d => (d, fp, d == owner))
              }
            }
        }
        .toDF(idCol, "fp", "novel")
    }
  }

  case class MediaFpRow(modality: String, fp: String, nUnits: Long,
      doc: Long)
  case class MediaFpRowT(modality: String, fp: String, nUnits: Long,
      doc: Long, eventTime: java.sql.Timestamp)

  /** First-owner gate over ARBITRARY content fingerprints —
    * [[noveltyOwnership]]'s state discipline (one owner per distinct
    * key, first-arrival-wins, min-id within a micro-batch) generalized
    * from winnow fingerprints to any (modality, fp, n_units, id) frame,
    * e.g. [[graft.pipeline.Multimodal.mediaFingerprints]] on an
    * arriving payload stream: the decode + fingerprint are stateless
    * scan-local maps, state is ONE long per distinct content group, and
    * the only shuffle carries fingerprint rows — payload bytes never
    * cross an exchange. Same id-ordered-ingestion equivalence contract
    * as [[noveltyOwnership]]; output (modality, fp, n_units, idCol,
    * novel).
    *
    * State lifecycle: with the defaults ownership is remembered FOREVER
    * (NoTimeout) — state grows with the distinct-content universe, the
    * correct gate for a bounded corpus build. For unbounded rolling
    * media ingestion pass `stateTtl` + `eventTimeCol` (a column of
    * `fps`, carried through the decode map via
    * [[graft.pipeline.Multimodal.mediaFingerprints]]'s carryCols): a
    * group's ownership is evicted once the event-time watermark passes
    * its LAST sighting by the TTL — the corpus-rotation horizon — after
    * which the next arrival re-claims it as novel. Total state is then
    * bounded by the content groups ACTIVE within one TTL horizon
    * instead of all groups ever seen ([[noveltyOwnership]]'s TTL arm,
    * generalized). */
  def fingerprintOwnership(fps: DataFrame, idCol: String,
      stateTtl: Option[String] = None,
      eventTimeCol: Option[String] = None): DataFrame = {
    require(stateTtl.isDefined == eventTimeCol.isDefined,
      "stateTtl and eventTimeCol come together (event-time TTL eviction)")
    val spark = fps.sparkSession
    import spark.implicits._
    if (stateTtl.isEmpty) {
      fps.select(col("modality"), col("fp"),
          col("n_units").alias("nUnits"),
          col(idCol).cast(LongType).alias("doc"))
        .as[MediaFpRow]
        .groupByKey(r => (r.modality, r.fp, r.nUnits))
        .flatMapGroupsWithState(OutputMode.Append(),
          GroupStateTimeout.NoTimeout()) {
          (key: (String, String, Long), rows: Iterator[MediaFpRow],
              state: GroupState[Long]) =>
            val docs = rows.map(_.doc).toSet
            if (docs.isEmpty) Iterator.empty
            else {
              val owner =
                if (state.exists) state.get
                else { val m = docs.min; state.update(m); m }
              docs.iterator.map(d => (key._1, key._2, key._3, d, d == owner))
            }
        }
        .toDF("modality", "fp", "n_units", idCol, "novel")
    } else {
      val ttl = stateTtl.get
      fps.select(col("modality"), col("fp"),
          col("n_units").alias("nUnits"),
          col(idCol).cast(LongType).alias("doc"),
          col(eventTimeCol.get).alias("eventTime"))
        .withWatermark("eventTime", ttl)
        .as[MediaFpRowT]
        .groupByKey(r => (r.modality, r.fp, r.nUnits))
        .flatMapGroupsWithState(OutputMode.Append(),
          GroupStateTimeout.EventTimeTimeout()) {
          (key: (String, String, Long), rows: Iterator[MediaFpRowT],
              state: GroupState[Long]) =>
            if (state.hasTimedOut) {
              state.remove() // ownership forgotten past the rotation horizon
              Iterator.empty
            } else {
              val batch = rows.toArray
              if (batch.isEmpty) Iterator.empty
              else {
                val docs = batch.map(_.doc).toSet
                val owner =
                  if (state.exists) state.get
                  else { val m = docs.min; state.update(m); m }
                // keep-alive: eviction clock restarts at the group's LAST
                // sighting (floor-clamped above the current watermark,
                // the noveltyOwnership convention)
                val lastMs = batch.map(_.eventTime.getTime).max
                state.setTimeoutTimestamp(
                  math.max(lastMs, state.getCurrentWatermarkMs() + 1), ttl)
                docs.iterator.map(d =>
                  (key._1, key._2, key._3, d, d == owner))
              }
            }
        }
        .toDF("modality", "fp", "n_units", idCol, "novel")
    }
  }

  /** The batch-formula rollup over a [[noveltyOwnership]] sink: per-doc
    * fingerprint count, first-owned count, and their ratio — identical
    * column contract to [[graft.pipeline.TextAnalysis.winnowNovelty]].
    * Works on the sink at ANY point in the stream's life (each (doc, fp)
    * row is emitted exactly once). */
  def noveltyScores(sink: DataFrame, idCol: String): DataFrame = sink
    .groupBy(col(idCol))
    .agg(count(lit(1)).alias("n_fps"),
      sum(when(col("novel"), 1L).otherwise(0L)).alias("n_novel"))
    .withColumn("novelty",
      col("n_novel").cast(DoubleType) / col("n_fps").cast(DoubleType))

  // ---------------------------------------------- streaming stat moments
  case class StatEvent(series: String, y: Long)

  /** Streaming (n, Σy, Σy²) feed: per micro-batch, the exact integer
    * first/second-moment DELTAS of `valueCol` per series — additive, so
    * a plain fold over the sink reconstructs the batch moment table for
    * any micro-batch split. These three numbers are the sufficient
    * statistics behind mean/variance/z-scores and Welch's t-test
    * ([[graft.pipeline.Drift.welchTTest]]'s per-cohort state), so any
    * of those refit from the fold with no history rescan. No
    * cross-batch state; one output row per (series, batch). */
  def statsDeltas(df: DataFrame, seriesCols: Seq[String],
      valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      valueCol.cast(LongType).alias("y"))
      .filter(col("y").isNotNull)
      .as[StatEvent]
    // Stateless per-PARTITION pre-aggregation (the histogramDeltas
    // discipline): moments are additive, so per-partition per-batch
    // deltas fold identically for any partitioning and micro-batching.
    val out = projected
      .mapPartitions { it =>
        val acc =
          scala.collection.mutable.SortedMap.empty[String, (Long, Long, Long)]
        it.foreach { e =>
          val (n, s1, s2) = acc.getOrElse(e.series, (0L, 0L, 0L))
          acc(e.series) = (n + 1, s1 + e.y, s2 + e.y * e.y)
        }
        acc.iterator.map { case (k, (n, s1, s2)) => (k, n, s1, s2) }
      }
      .toDF("series", "n", "s1", "s2")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      col("n"), col("s1"), col("s2")): _*)
  }

  // ---------------------------------------------- streaming OLS moments
  case class OlsEvent(series: String, x1: Long, x2: Long, y: Long)

  /** Streaming OLS-moment feed: per micro-batch, the nine exact integer
    * moment DELTAS per series that [[graft.pipeline.Regression]] fits
    * from — moments are additive, so `sum` per series over the sink
    * reconstructs the exact batch moment table for any micro-batch
    * split, and [[graft.pipeline.Regression.olsFromMoments]] turns the
    * fold into the identical bit-exact βs (incremental model refit with
    * no history rescan). No cross-batch state (deltas need none); one
    * output row per (series, batch). */
  def olsMomentDeltas(df: DataFrame, seriesCols: Seq[String], x1: Column,
      x2: Column, y: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      x1.cast(LongType).alias("x1"), x2.cast(LongType).alias("x2"),
      y.cast(LongType).alias("y"))
      .filter(col("x1").isNotNull && col("x2").isNotNull &&
        col("y").isNotNull)
      .as[OlsEvent]
    // Stateless per-PARTITION pre-aggregation (the histogramDeltas
    // discipline): moments are additive, so per-partition per-batch
    // deltas fold identically for any partitioning and micro-batching.
    val out = projected
      .mapPartitions { it =>
        val acc = scala.collection.mutable.SortedMap.empty[String, Array[Long]]
        it.foreach { e =>
          val a = acc.getOrElseUpdate(e.series, new Array[Long](9))
          a(0) += 1; a(1) += e.x1; a(2) += e.x2; a(3) += e.y
          a(4) += e.x1 * e.x1; a(5) += e.x1 * e.x2; a(6) += e.x2 * e.x2
          a(7) += e.x1 * e.y; a(8) += e.x2 * e.y
        }
        acc.iterator.map { case (k, a) =>
          (k, a(0), a(1), a(2), a(3), a(4), a(5), a(6), a(7), a(8))
        }
      }
      .toDF("series", "n", "sx1", "sx2", "sy", "sx11", "sx12", "sx22",
        "sx1y", "sx2y")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      col("n"), col("sx1"), col("sx2"), col("sy"), col("sx11"),
      col("sx12"), col("sx22"), col("sx1y"), col("sx2y")): _*)
  }

  // ---------------------------------------------- streaming pair counts
  case class PairEvent(w1: String, w2: String)

  /** Streaming pair-count feed: per micro-batch, the exact COUNT DELTAS
    * per (w1, w2) string pair — counts are additive, so `sum(cnt) per
    * (w1, w2)` over the sink reconstructs the exact batch pair grid of
    * everything ingested, for any micro-batch split (pairs are generated
    * WITHIN arriving rows — e.g. a document's bigrams — so no pair can
    * straddle a batch boundary and no cross-batch state is needed).
    * Deltas are emitted per INPUT PARTITION per batch (a stateless
    * map-side combine — the [[histogramDeltas]] discipline): no
    * exchange, no sort, no state stores. Sink traffic per batch =
    * distinct pairs touched per partition, not occurrences. */
  def pairCountDeltas(df: DataFrame, aCol: Column,
      bCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      aCol.cast(StringType).alias("w1"), bCol.cast(StringType).alias("w2"))
      .filter(col("w1").isNotNull && col("w2").isNotNull)
      .as[PairEvent]
    // Stateless per-PARTITION pre-aggregation (the histogramDeltas
    // discipline): count deltas are additive, so per-partition per-batch
    // pair counts sum-fold to the identical grid for any partitioning and
    // any micro-batch split — no exchange, no sort, no state stores;
    // parallelism comes from the input partitions instead of salt groups.
    projected
      .mapPartitions { it =>
        val acc =
          scala.collection.mutable.SortedMap.empty[(String, String), Long]
        it.foreach { e =>
          val k = (e.w1, e.w2)
          acc(k) = acc.getOrElse(k, 0L) + 1L
        }
        acc.iterator.map { case ((a, b), c) => (a, b, c) }
      }
      .toDF("w1", "w2", "cnt")
  }

  // ----------------------------------------------- streaming Gram matrix
  case class GramEvent(vec: Seq[Long])

  /** Streaming Gram-matrix feed: per micro-batch, the exact integer
    * second-moment DELTAS of the batch's vectors — the packed
    * upper-triangle cell sums Σ vᵢ·vⱼ plus the contributing row count,
    * per input partition. Gram sums are additive across rows, so
    * `sum(s), sum(n) per (i, j)` over the sink reconstructs the exact
    * batch [[graft.pipeline.Pca.gramMatrix]] of everything ingested, for
    * any micro-batch split — the streaming face of the one-pass
    * PCA/covariance trainer (an incremental model refresh reads the
    * folded grid and re-runs the driver-side eigensolve; the corpus is
    * never rescanned). Cell layout is the same k ↔ (i ≤ j) enumeration
    * as [[graft.functions.GramMatrixAgg]], and every cell of every
    * (batch, group) is emitted — including zero sums — so the folded n
    * is the row count on every cell, exactly like the batch output.
    *
    * The emission is a stateless per-partition pre-aggregation (the
    * [[histogramDeltas]] discipline): no exchange, no sort, no state
    * stores — Gram deltas are additive across partitions exactly as they
    * are across rows. Per partition the in-flight accumulator is one
    * dim(dim+1)/2 Long array (~16 KiB at dim 64), the same bounded
    * footprint as the batch aggregate's buffer; no cross-batch state is
    * carried (deltas need none). Sink traffic is cells × input
    * partitions per micro-batch, independent of row count. Null and
    * wrong-length vectors are rejected up front (the batch aggregate's
    * convention). */
  def gramDeltas(df: DataFrame, vecCol: Column, dim: Int): DataFrame = {
    require(dim >= 1, "need dim >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val nCells = dim * (dim + 1) / 2
    val projected = df.select(
      transform(vecCol, x => x.cast(LongType)).alias("vec"))
      .filter(col("vec").isNotNull && size(col("vec")) === dim)
      .as[GramEvent]
    // Stateless per-PARTITION pre-aggregation (the histogramDeltas
    // discipline): Gram sums and row counts are additive, so
    // per-partition per-batch cell deltas fold identically for any
    // partitioning and any micro-batch split; every cell of a non-empty
    // partition is emitted — including zero sums — so the folded n stays
    // the row count on every cell, exactly like the batch output.
    projected
      .mapPartitions { it =>
        val acc = new Array[Long](nCells)
        var n = 0L
        it.foreach { e =>
          val v = e.vec.toArray
          var k = 0
          var i = 0
          while (i < dim) {
            val vi = v(i)
            var j = i
            while (j < dim) { acc(k) += vi * v(j); k += 1; j += 1 }
            i += 1
          }
          n += 1
        }
        if (n == 0) Iterator.empty
        else (0 until nCells).iterator.map(k => (k, acc(k), n))
      }
      .toDF("k", "s", "n")
  }

  // ----------------------------------------------- streaming pattern DFA
  case class DfaEvent(series: String, tsUs: Long, tie: Long, sym: String)
  case class DfaState(state: Int, lastTsUs: Long, lastTie: Long)

  /** Streaming CEP: run a caller-supplied DFA over each series' event
    * symbols in (ts, tie) order and emit per-micro-batch DELTAS of
    * (events consumed, matches accepted) — `sum` per series over the sink
    * reconstructs the batch trace length and non-overlapping match count
    * with ONE integer of pattern state per series, where the batch
    * [[graft.pipeline.Analytics.sequencePattern]] holds the whole trace.
    * This is the streaming face of sequence-pattern matching: a regular
    * pattern's matches over an unbounded stream in O(1) state.
    *
    * `transitions` must be TOTAL over (states × symbols seen):
    * (state, symbol) → (next state, accepted?). Accepting counts a match
    * and the supplied next state resumes AFTER the consumed symbol —
    * non-overlapping leftmost-SHORTEST (reluctant) semantics when the
    * DFA is the standard candidate-set construction of a regex; supply a
    * reluctant-quantifier pattern to the batch twin/oracle (the
    * q_stream_seq_pattern differential pins DFA == lazy-regex counting on
    * random traces). Unmapped events become `defaultSym`. Late rows
    * (behind the series high-water mark) are dropped, the
    * [[scd2Changelog]] convention; within a batch rows are sorted by
    * (ts, tie). */
  def patternDfa(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      eventCol: String, alphabet: Map[String, String],
      transitions: Map[(Int, String), (Int, Boolean)],
      defaultSym: String = "o", tieCol: String = ""): DataFrame = {
    require(transitions.nonEmpty, "need a transition table")
    // Totality is validated HERE, on the driver, before the stream starts:
    // an unmapped (state, symbol) discovered inside flatMapGroupsWithState
    // would kill the query mid-flight at runtime instead of failing fast.
    // Every symbol an event can render to is alphabet.values ++ defaultSym;
    // every reachable state is 0 plus the transition targets.
    locally {
      val syms = alphabet.values.toSet + defaultSym
      val states = transitions.valuesIterator.map(_._1).toSet ++
        transitions.keysIterator.map(_._1) + 0
      val missing = for (s <- states; y <- syms if !transitions.contains((s, y)))
        yield (s, y)
      require(missing.isEmpty,
        s"transition table not total over reachable states x symbols; " +
          s"missing: ${missing.toSeq.sorted.take(8).mkString(", ")}")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val symOf = alphabet.toSeq.sortBy(_._1)
      .foldRight(lit(defaultSym): Column) { case ((k, v), acc) =>
        when(col(eventCol) === k, lit(v)).otherwise(acc)
      }
    val tie = if (tieCol.isEmpty) lit(0L) else col(tieCol).cast(LongType)
    val events = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"), tie.alias("tie"),
      symOf.alias("sym")).as[DfaEvent]
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[DfaEvent], state: GroupState[DfaState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.tsUs, e.tie))
          var st = state.getOption.getOrElse(DfaState(0, Long.MinValue, Long.MinValue))
          var consumed = 0L
          var matches = 0L
          sorted.foreach { e =>
            val late = e.tsUs < st.lastTsUs ||
              (e.tsUs == st.lastTsUs && e.tie <= st.lastTie)
            if (!late) {
              val (next, hit) = transitions.getOrElse((st.state, e.sym),
                sys.error(s"transition table not total: state ${st.state} " +
                  s"symbol '${e.sym}'"))
              st = DfaState(next, e.tsUs, e.tie)
              consumed += 1
              if (hit) matches += 1
            }
          }
          state.update(st)
          if (consumed > 0 || matches > 0)
            Iterator.single((key, consumed, matches))
          else Iterator.empty
      }
      .toDF("series", "trace_len", "n_matches")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      col("trace_len"), col("n_matches")): _*)
  }

  // -------------------------------------------- streaming transition steps
  case class StepEvent(series: String, tsUs: Long, tie: Long, typ: String)
  case class StepState(lastTsUs: Long, lastTie: Long, lastType: String)

  /** Streaming Markov transition feed: per micro-batch, the exact COUNT
    * DELTAS of adjacent (from → to) event-type steps per series in
    * (ts, tie) order — including the step that straddles the batch
    * boundary, because the state remembers the series' last event. A
    * plain `sum(n) per (from_type, to_type)` over the sink reconstructs
    * the exact batch [[graft.pipeline.Analytics.transitionMatrix]] counts
    * of everything ingested (adjacency is local, so counts are additive
    * once the boundary step is owned by the arriving batch). State is
    * ONE (ts, tie, type) triple per series; late rows (at or behind the
    * series high-water mark) drop — the [[scd2Changelog]] convention;
    * within a batch rows sort by (ts, tie). */
  def transitionDeltas(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      typeCol: String, tieCol: String = ""): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tie = if (tieCol.isEmpty) lit(0L) else col(tieCol).cast(LongType)
    val events = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"), tie.alias("tie"),
      col(typeCol).cast(StringType).alias("typ")).as[StepEvent]
    events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[StepEvent],
            state: GroupState[StepState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.tsUs, e.tie))
          var st = state.getOption
            .getOrElse(StepState(Long.MinValue, Long.MinValue, null))
          val acc = scala.collection.mutable.SortedMap
            .empty[(String, String), Long]
          sorted.foreach { e =>
            val late = e.tsUs < st.lastTsUs ||
              (e.tsUs == st.lastTsUs && e.tie <= st.lastTie)
            if (!late) {
              if (st.lastType != null) {
                val k = (st.lastType, e.typ)
                acc(k) = acc.getOrElse(k, 0L) + 1L
              }
              st = StepState(e.tsUs, e.tie, e.typ)
            }
          }
          state.update(st)
          acc.iterator.map { case ((f, t), n) => (f, t, n) }
      }
      .toDF("from_type", "to_type", "n")
  }

  // ------------------------------------------------ streaming interpolation
  case class InterpEvent(series: String, tsUs: Long, value: Double,
      eventTime: java.sql.Timestamp)
  case class LastObs(tsUs: Long, value: Double)
  case class InterpOut(series: String, tsUs: Long, value: Double,
      isInterpolated: Boolean)

  /** Streaming gap-fill: each series is resampled onto the `freq` grid and
    * missing buckets are emitted with `ffill` (previous value) or `linear`
    * (lerp between the flanking observations) — the streaming analog of the
    * batch resample+interpolate pipeline, emitted incrementally with ONE
    * (ts, value) record of state per series.
    *
    * On each observation at bucket b_cur with previous observation at bucket
    * b_prev, the operator emits the interpolated buckets (b_prev, b_cur)
    * and the actual bucket b_cur. The FIRST observation in a bucket wins;
    * later observations landing in an already-emitted bucket are ignored, so
    * an append sink sees each (series, bucket) exactly once — the same
    * granularity as batch `resample(freq, "floor")`, whose resample +
    * interpolate pipeline this operator equals row-for-row (asserted
    * differentially on random series in the spec).
    *
    * `stateTtl` evicts idle series once the watermark passes them (a later
    * observation then starts a fresh segment instead of filling across the
    * idle gap).
    */
  def interpolate(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      valueCol: String, freq: String, method: String = "ffill",
      stateTtl: Option[String] = None): DataFrame = {
    require(method == "ffill" || method == "linear",
      s"streaming interpolate supports ffill|linear, got '$method'")
    val spark = df.sparkSession
    import spark.implicits._
    val stepUs = Resample.parseFreq(freq).micros
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"),
      col(valueCol).cast(DoubleType).alias("value"),
      col(tsCol).alias("eventTime"))
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[InterpEvent]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[InterpEvent], state: GroupState[LastObs]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var last = state.getOption.orNull
            val outRows = Seq.newBuilder[InterpOut]
            sorted.foreach { e =>
              val bucket = Math.floorDiv(e.tsUs, stepUs) * stepUs
              if (last != null && bucket > last.tsUs) {
                var t = last.tsUs + stepUs
                while (t < bucket) {
                  val v = method match {
                    case "ffill" => last.value
                    case "linear" => last.value + (e.value - last.value) *
                      ((t - last.tsUs).toDouble / (bucket - last.tsUs).toDouble)
                  }
                  outRows += InterpOut(key, t, v, isInterpolated = true)
                  t += stepUs
                }
              }
              // strictly greater: a second observation in an already-emitted
              // bucket must not re-emit it (append sinks would see duplicates)
              if (last == null || bucket > last.tsUs) {
                outRows += InterpOut(key, bucket, e.value, isInterpolated = false)
                last = LastObs(bucket, e.value)
              }
            }
            if (last != null) {
              state.update(last)
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(last.tsUs / 1000, state.getCurrentWatermarkMs() + 1), ttl))
            }
            outRows.result().iterator
          }
      }
    out.toDF()
      .select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
        timestamp_micros(col("tsUs")).alias(tsCol),
        col("value").alias(valueCol),
        col("isInterpolated").alias("is_ts_interpolated")): _*)
  }

  // ------------------------------------------------ stateful run tracking
  case class ObsEvent(series: String, tsUs: Long, metrics: Seq[Double],
      eventTime: java.sql.Timestamp)
  case class RunState(startUs: Long, lastUs: Long, metrics: Seq[Double],
      observations: Int)

  /** Streaming analog of `extractStateIntervals` (equality state): per
    * series, maximal runs of consecutive observations with identical metric
    * vectors close and emit [start_ts, end_ts] when the state changes.
    *
    * State per key is one open run (constant size). Rows inside a micro
    * batch are sorted by event time; LATE rows arriving after their run
    * closed start a new run rather than rewriting history — the documented
    * streaming-consistency trade-off vs the batch operator.
    *
    * `stateTtl` (optional): once the watermark passes the run's last
    * observation by the TTL, the open run is emitted as closed and its
    * state evicted — so idle series both flush their final run (which
    * otherwise only a state *change* emits) and stop occupying memory.
    */
  def stateIntervalRuns(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      metricCols: Seq[String], stateTtl: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"),
      array(metricCols.map(col(_).cast(DoubleType)): _*).alias("metrics"),
      col(tsCol).alias("eventTime"))
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[ObsEvent]

    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[ObsEvent], state: GroupState[RunState]) =>
          if (state.hasTimedOut) {
            val cur = state.get
            state.remove()
            if (cur.observations >= 2) Iterator((key, cur.startUs, cur.lastUs))
            else Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var cur = state.getOption.orNull
            val closed = Seq.newBuilder[(String, Long, Long)]
            sorted.foreach { e =>
              if (cur == null) cur = RunState(e.tsUs, e.tsUs, e.metrics, 1)
              else if (cur.metrics == e.metrics)
                cur = cur.copy(lastUs = e.tsUs, observations = cur.observations + 1)
              else {
                if (cur.observations >= 2) closed += ((key, cur.startUs, cur.lastUs))
                cur = RunState(e.tsUs, e.tsUs, e.metrics, 1)
              }
            }
            if (cur != null) {
              state.update(cur)
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(cur.lastUs / 1000, state.getCurrentWatermarkMs() + 1), ttl))
            }
            closed.result().iterator
          }
      }
      .toDF("series", "start_us", "end_us")
    out
      .withColumn("start_ts", timestamp_micros(col("start_us")))
      .withColumn("end_ts", timestamp_micros(col("end_us")))
      .select(typedSeriesCols(df.schema, seriesCols) :+ col("start_ts") :+ col("end_ts"): _*)
  }

  case class ThreshState(lastValue: Double, lastTsUs: Long)

  /** Streaming threshold-crossing detector: one (value, ts) pair of state
    * per series, the twin of [[graft.tsdf.Stats.thresholdCrossings]] —
    * emits a row only when the series crosses `threshold` between
    * consecutive observations. Late rows (older than the last processed
    * timestamp) are DROPPED, matching the in-order contract of the other
    * indicator twins. Output: series + (ts, prev_ts, prev_value, value,
    * direction). */
  def thresholdCrossings(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      valueCol: String, threshold: Double,
      stateTtl: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"),
      col(valueCol).cast(DoubleType).alias("value"),
      col(tsCol).alias("eventTime"))
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[EmaEvent]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[EmaEvent], state: GroupState[ThreshState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var cur = state.getOption.orNull
            val outRows = sorted.flatMap { e =>
              if (cur != null && e.tsUs < cur.lastTsUs) None
              else {
                val emit =
                  if (cur == null) None
                  else {
                    val up = cur.lastValue < threshold && e.value >= threshold
                    val down = cur.lastValue >= threshold && e.value < threshold
                    if (up || down)
                      Some((key, e.tsUs, cur.lastTsUs, cur.lastValue,
                        e.value, if (up) "up" else "down"))
                    else None
                  }
                cur = ThreshState(e.value, e.tsUs)
                emit
              }
            }
            if (cur != null) {
              state.update(cur)
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(cur.lastTsUs / 1000,
                  state.getCurrentWatermarkMs() + 1), ttl))
            }
            outRows.iterator
          }
      }
      .toDF("series", "tsUs", "prevTsUs", "prev_value", "value", "direction")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      timestamp_micros(col("tsUs")).alias(tsCol),
      timestamp_micros(col("prevTsUs")).alias("prev_ts"),
      col("prev_value"), col("value").alias(valueCol), col("direction")): _*)
  }

  case class StochState(recent: Seq[Double], k1: Option[Double],
      k2: Option[Double], lastTsUs: Long)

  /** Streaming stochastic oscillator: per-series state is the trailing
    * `window − 1` values (the frame buffer, like [[rollingMedian]]) plus
    * the previous two %K values for the %D mean — bit-identical to
    * [[graft.tsdf.Stats.stochastic]] (same selections, same fixed-order
    * IEEE assembly; differentially asserted). Late rows are DROPPED.
    * Output: series + ts + value + pct_k + pct_d. */
  def stochastic(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      valueCol: String, window: Int,
      stateTtl: Option[String] = None): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"),
      col(valueCol).cast(DoubleType).alias("value"),
      col(tsCol).alias("eventTime"))
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[EmaEvent]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[EmaEvent], state: GroupState[StochState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var cur = state.getOption.getOrElse(
              StochState(Vector.empty, None, None, Long.MinValue))
            var seen = state.exists
            val outRows = sorted.flatMap { e =>
              if (seen && e.tsUs < cur.lastTsUs) None
              else {
                seen = true
                val frame = (cur.recent :+ e.value).takeRight(window)
                val ll = frame.min
                val hh = frame.max
                val k: Option[Double] =
                  if (hh == ll) None
                  else Some(100.0 * (e.value - ll) / (hh - ll))
                val d: Option[Double] =
                  for (a <- cur.k2; b <- cur.k1; c <- k)
                    yield (a + b + c) / 3.0
                cur = StochState((cur.recent :+ e.value).takeRight(window - 1),
                  k, cur.k1, e.tsUs)
                Some((key, e.tsUs, e.value, k, d))
              }
            }
            if (seen) {
              state.update(cur)
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(cur.lastTsUs / 1000,
                  state.getCurrentWatermarkMs() + 1), ttl))
            }
            outRows.iterator
          }
      }
      .toDF("series", "tsUs", "value", "pct_k", "pct_d")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      timestamp_micros(col("tsUs")).alias(tsCol),
      col("value").alias(valueCol), col("pct_k"), col("pct_d")): _*)
  }

  case class DonchianState(recent: Seq[Double], lastTsUs: Long)

  /** Streaming Donchian channels: per-series state is the trailing
    * `window − 1` values, the twin of [[graft.tsdf.Stats.donchian]] —
    * upper/lower are frame selections, mid the same fixed-order IEEE
    * expression (differentially asserted bit-identical). Late rows are
    * DROPPED. Output: series + ts + value + dc_upper + dc_lower +
    * dc_mid. */
  def donchian(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      valueCol: String, window: Int,
      stateTtl: Option[String] = None): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"),
      col(valueCol).cast(DoubleType).alias("value"),
      col(tsCol).alias("eventTime"))
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[EmaEvent]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[EmaEvent], state: GroupState[DonchianState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var cur = state.getOption.getOrElse(
              DonchianState(Vector.empty, Long.MinValue))
            var seen = state.exists
            val outRows = sorted.flatMap { e =>
              if (seen && e.tsUs < cur.lastTsUs) None
              else {
                seen = true
                val frame = (cur.recent :+ e.value).takeRight(window)
                val upper = frame.max
                val lower = frame.min
                cur = DonchianState(
                  (cur.recent :+ e.value).takeRight(window - 1), e.tsUs)
                Some((key, e.tsUs, e.value, upper, lower,
                  (upper + lower) / 2.0))
              }
            }
            if (seen) {
              state.update(cur)
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(cur.lastTsUs / 1000,
                  state.getCurrentWatermarkMs() + 1), ttl))
            }
            outRows.iterator
          }
      }
      .toDF("series", "tsUs", "value", "dc_upper", "dc_lower", "dc_mid")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      timestamp_micros(col("tsUs")).alias(tsCol),
      col("value").alias(valueCol), col("dc_upper"), col("dc_lower"),
      col("dc_mid")): _*)
  }

  case class HwState(cnt: Int, warmSum: Double, level: Double,
      trend: Double, ring: Seq[Double], lastTsUs: Long)

  /** Streaming additive Holt-Winters: per-series state is the warm-up
    * accumulator plus the rotated `m`-factor seasonal ring — the twin of
    * [[graft.tsdf.Stats.holtWinters]] / [[graft.functions
    * .HoltWintersExact]], bit-identical by construction (same fixed-order
    * IEEE recursion, same rotation; differentially asserted). Emits null
    * level/trend/seasonal through the first season. Late rows are
    * DROPPED. Output: series + ts + value + hw_level + hw_trend +
    * hw_seasonal. */
  def holtWinters(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      valueCol: String, alpha: Double, beta: Double, gamma: Double, m: Int,
      stateTtl: Option[String] = None): DataFrame = {
    require(m >= 2, "season length m must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"),
      col(valueCol).cast(DoubleType).alias("value"),
      col(tsCol).alias("eventTime"))
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[EmaEvent]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[EmaEvent], state: GroupState[HwState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var cur = state.getOption.getOrElse(
              HwState(0, 0.0, 0.0, 0.0, Vector.empty, Long.MinValue))
            var seen = state.exists
            val outRows = sorted.flatMap { e =>
              if (seen && e.tsUs < cur.lastTsUs) None
              else {
                seen = true
                val x = e.value
                val cnt = cur.cnt + 1
                cur =
                  if (cnt < m)
                    cur.copy(cnt = cnt, warmSum = cur.warmSum + x,
                      ring = cur.ring :+ x, lastTsUs = e.tsUs)
                  else if (cnt == m) {
                    val ws = cur.warmSum + x
                    val level = ws / m
                    HwState(cnt, ws, level, 0.0,
                      (cur.ring :+ x).map(w => w - level), e.tsUs)
                  } else {
                    val sPrev = cur.ring.head
                    val nl = alpha * (x - sPrev) +
                      (1 - alpha) * (cur.level + cur.trend)
                    val nt = beta * (nl - cur.level) + (1 - beta) * cur.trend
                    val sNew = gamma * (x - nl) + (1 - gamma) * sPrev
                    HwState(cnt, cur.warmSum, nl, nt,
                      cur.ring.tail :+ sNew, e.tsUs)
                  }
                val emit: (Option[Double], Option[Double], Option[Double]) =
                  if (cnt > m)
                    (Some(cur.level), Some(cur.trend), Some(cur.ring.last))
                  else (None, None, None)
                Some((key, e.tsUs, x, emit._1, emit._2, emit._3))
              }
            }
            if (seen) {
              state.update(cur)
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(cur.lastTsUs / 1000,
                  state.getCurrentWatermarkMs() + 1), ttl))
            }
            outRows.iterator
          }
      }
      .toDF("series", "tsUs", "value", "hw_level", "hw_trend", "hw_seasonal")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(
      timestamp_micros(col("tsUs")).alias(tsCol),
      col("value").alias(valueCol), col("hw_level"), col("hw_trend"),
      col("hw_seasonal")): _*)
  }

  // ------------------------------------------------- streaming SCD2 changelog
  case class Scd2Event(series: String, tsUs: Long, tie: Long,
      attrs: Seq[String], eventTime: java.sql.Timestamp)
  case class Scd2State(attrs: Seq[String], lastTsUs: Long, lastTie: Long)

  /** Streaming SCD2 CHANGELOG — the dimension-maintenance face of
    * [[graft.pipeline.Cdc.scd2FromLog]]: per id, emit a row whenever the
    * tracked attributes differ (null-safe) from the previous change, in
    * (ts, tie) order; no-op re-emits are dropped. The emitted rows are
    * exactly the batch operator's collapsed change set (its `valid_from`
    * rows) — `valid_to` is a derivable view (lead over the changelog), so
    * the append-only sink stays monotone and never rewrites history.
    * State per id is ONE attribute tuple (constant size; `stateTtl`
    * evicts ids idle past the watermark). Rows arriving out of order
    * across micro-batches (ts below the id's last change) are skipped —
    * the same documented append-mode trade as [[asOfJoin]]; within a
    * micro-batch, rows process in (ts, tie) order. `tieCol` totalizes the
    * order on duplicate timestamps like the batch tieCols. */
  def scd2Changelog(df: DataFrame, idCols: Seq[String], tsCol: String,
      attrCols: Seq[String], tieCol: String,
      stateTtl: Option[String] = None): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df.select(
      seriesKey(idCols).alias("series"),
      unix_micros(col(tsCol)).alias("tsUs"),
      col(tieCol).cast(LongType).alias("tie"),
      array(attrCols.map(col(_).cast(StringType)): _*).alias("attrs"),
      col(tsCol).alias("eventTime"))
    val events = stateTtl.fold(projected)(ttl =>
      projected.withWatermark("eventTime", ttl)).as[Scd2Event]
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[Scd2Event], state: GroupState[Scd2State]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.tsUs, e.tie))
            var cur = state.getOption.orNull
            val outRows = sorted.flatMap { e =>
              val late = cur != null && (e.tsUs < cur.lastTsUs ||
                (e.tsUs == cur.lastTsUs && e.tie <= cur.lastTie))
              if (late) None
              else {
                // null-safe element compare: Seq equality treats null
                // elements as equal, mirroring the batch <=> struct
                val changed = cur == null || cur.attrs != e.attrs
                cur = Scd2State(e.attrs, e.tsUs, e.tie)
                if (changed) Some((key, e.tsUs, e.attrs)) else None
              }
            }
            if (cur != null) {
              state.update(cur)
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                math.max(cur.lastTsUs / 1000,
                  state.getCurrentWatermarkMs() + 1), ttl))
            }
            outRows.iterator
          }
      }
      .toDF("series", "tsUs", "attrs")
    out.select(typedSeriesCols(df.schema, idCols) ++
      (timestamp_micros(col("tsUs")).alias(tsCol) +:
        attrCols.zipWithIndex.map { case (a, i) =>
          col("attrs").getItem(i).cast(df.schema(a).dataType).alias(a)
        }): _*)
  }

  // ----------------------------------------------- streaming intervals
  case class IvEvent(series: String, sUs: Long, eUs: Long,
      values: Seq[Option[Double]])
  /** Per-metric winning (origStart, origEnd, value) struct of one
    * elementary segment — the batch kernel's max-struct resolution. */
  case class IvWin(ws: Long, we: Long, v: Double)
  /** One elementary segment of a series' disjoint grid, carrying each
    * metric's winner independently (None = no covering interval carries
    * that metric). */
  case class IvSeg(s: Long, e: Long, wins: Seq[Option[IvWin]])
  case class IvState(rev: Long, segs: Seq[IvSeg])

  /** Streaming interval algebra — the ingest-time
    * [[graft.intervals.IntervalsDF.makeDisjoint]] maintainer: state per
    * series is the current ELEMENTARY disjoint grid (no output coalescing
    * in state), each segment carrying EVERY metric's winning
    * `(origStart, origEnd, value)` struct independently — the batch
    * kernel's per-metric `max(struct(start, end, value))` resolution.
    * Exactness for ANY arrival order (no late-drop needed — interval
    * merge is order-independent) rests on two facts, both PER METRIC:
    * the max-struct winner is associative/commutative, and in an
    * elementary grid every already-seen interval covers ALL of a segment
    * or none of it, so resolving a new batch against per-segment winners
    * equals resolving against all original intervals. Per batch, each
    * TOUCHED series emits its full COALESCED snapshot (touching
    * neighbors merged when ALL metric values are null-safe equal — the
    * issue-268 semantics, vector form) tagged with a monotone `rev`;
    * "latest rev per series" over the sink IS the batch `makeDisjoint`
    * of everything ingested, for any micro-batch split (the randomized
    * multi-metric differential). State is O(series' boundary count) ×
    * metric count — the disjoint set is itself the product, the same
    * per-group constraint class the batch sweep kernel carries. Metrics
    * are carried as doubles (the documented contract). */
  def disjointIntervals(df: DataFrame, startCol: String, endCol: String,
      seriesCols: Seq[String], metricCols: Seq[String]): DataFrame = {
    require(metricCols.nonEmpty, "at least one metric column")
    val spark = df.sparkSession
    import spark.implicits._
    val k = metricCols.size
    val events = df.select(
      seriesKey(seriesCols).alias("series"),
      unix_micros(col(startCol)).alias("sUs"),
      unix_micros(col(endCol)).alias("eUs"),
      array(metricCols.map(m => col(m).cast(DoubleType)): _*)
        .alias("values")).as[IvEvent]

    // lexicographic (ws, we, v) — None < Some, mirroring the batch kernel
    // where null-metric intervals never enter that metric's max
    def winGt(aWs: Long, aWe: Long, aV: Double,
        bWs: Long, bWe: Long, bV: Double): Boolean =
      aWs > bWs || (aWs == bWs && (aWe > bWe ||
        (aWe == bWe && java.lang.Double.compare(aV, bV) > 0)))

    val out = events
      .groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[IvEvent], state: GroupState[IvState]) =>
          val batch = rows.toArray
          if (batch.isEmpty) Iterator.empty
          else {
            val st = state.getOption.getOrElse(IvState(0L, Seq.empty))
            val oldSegs = st.segs.toArray // sorted, disjoint, elementary
            // 1. elementary boundary set: old grid + new interval endpoints
            val bset = new java.util.TreeSet[java.lang.Long]()
            oldSegs.foreach { g => bset.add(g.s); bset.add(g.e) }
            batch.foreach { iv => bset.add(iv.sUs); bset.add(iv.eUs) }
            val bounds = new Array[Long](bset.size)
            locally {
              var i = 0
              val it = bset.iterator()
              while (it.hasNext) { bounds(i) = it.next(); i += 1 }
            }
            // 2. sweep the new intervals across the grid: a segment (p, p2)
            // of consecutive boundaries is covered by interval iv iff
            // iv.s <= p && iv.e >= p2 (endpoints are boundaries), so
            // activation is "s <= p", deactivation "e <= p"
            val sortedNew = batch.sortBy(iv => (iv.sUs, iv.eUs))
            val exitQ = new java.util.PriorityQueue[Integer](
              math.max(1, sortedNew.length),
              (a: Integer, b: Integer) => java.lang.Long.compare(
                sortedNew(a).eUs, sortedNew(b).eUs))
            // one active-winner set PER METRIC, each ordered by the batch
            // kernel's max(struct(start, end, value)) — the TreeSet max IS
            // that metric's winner among active non-null carriers
            val actW = Array.tabulate(k)(m =>
              new java.util.TreeSet[Integer](
                (a: Integer, b: Integer) => {
                  val x = sortedNew(a); val y = sortedNew(b)
                  var c = java.lang.Long.compare(x.sUs, y.sUs)
                  if (c == 0) c = java.lang.Long.compare(x.eUs, y.eUs)
                  if (c == 0) c = java.lang.Double.compare(
                    x.values(m).get, y.values(m).get)
                  if (c == 0) c = Integer.compare(a, b)
                  c
                }))
            var actAll = 0
            var ni = 0
            var op = 0
            val newSegs = scala.collection.mutable.ArrayBuffer.empty[IvSeg]
            var bi = 0
            while (bi < bounds.length - 1) {
              val p = bounds(bi); val p2 = bounds(bi + 1)
              while (ni < sortedNew.length && sortedNew(ni).sUs <= p) {
                val iv = sortedNew(ni)
                if (iv.eUs > p) { // zero/negative-width never activates
                  exitQ.add(ni); actAll += 1
                  var m = 0
                  while (m < k) {
                    if (iv.values(m).isDefined) actW(m).add(ni)
                    m += 1
                  }
                }
                ni += 1
              }
              while (!exitQ.isEmpty && sortedNew(exitQ.peek()).eUs <= p) {
                val idx = exitQ.poll(); actAll -= 1
                val iv = sortedNew(idx)
                var m = 0
                while (m < k) {
                  if (iv.values(m).isDefined) actW(m).remove(idx)
                  m += 1
                }
              }
              while (op < oldSegs.length && oldSegs(op).e <= p) op += 1
              val og = if (op < oldSegs.length && oldSegs(op).s <= p)
                oldSegs(op) else null
              if (og != null || actAll > 0) {
                val wins = new Array[Option[IvWin]](k)
                var m = 0
                while (m < k) {
                  var best: IvWin =
                    if (og != null) og.wins(m).orNull else null
                  if (!actW(m).isEmpty) {
                    val t = sortedNew(actW(m).last())
                    val tv = t.values(m).get
                    if (best == null ||
                        winGt(t.sUs, t.eUs, tv, best.ws, best.we, best.v))
                      best = IvWin(t.sUs, t.eUs, tv)
                  }
                  wins(m) = Option(best)
                  m += 1
                }
                newSegs += IvSeg(p, p2, wins.toSeq)
              }
              bi += 1
            }
            val rev = st.rev + 1
            state.update(IvState(rev, newSegs.toSeq))
            // 3. emit the coalesced snapshot: touching neighbors with an
            // ALL-metric null-safe-equal value merge (the batch <=> vector)
            val outRows = scala.collection.mutable.ArrayBuffer
              .empty[(String, Long, Long, Long, Seq[Option[Double]])]
            newSegs.foreach { g =>
              val vals = g.wins.map(_.map(_.v))
              val mergeable = outRows.nonEmpty && {
                val last = outRows.last
                last._4 == g.s && last._5.corresponds(vals) {
                  case (None, None) => true
                  case (Some(a), Some(b)) =>
                    java.lang.Double.compare(a, b) == 0
                  case _ => false
                }
              }
              if (mergeable) {
                val last = outRows.last
                outRows(outRows.length - 1) =
                  (last._1, last._2, last._3, g.e, last._5)
              } else outRows += ((key, rev, g.s, g.e, vals))
            }
            outRows.iterator
          }
      }
      .toDF("series", "rev", "sUs", "eUs", "values")
    out.select(typedSeriesCols(df.schema, seriesCols) ++ Seq(col("rev"),
      col("sUs").alias("start_us"), col("eUs").alias("end_us")) ++
      metricCols.zipWithIndex.map { case (m, i) =>
        col("values").getItem(i).alias(m) }: _*)
  }

  /** Single-metric face of [[disjointIntervals]] (the original v1
    * signature), kept for callers and the shared oracle fixture. */
  def disjointIntervals(df: DataFrame, startCol: String, endCol: String,
      seriesCols: Seq[String], metricCol: String): DataFrame =
    disjointIntervals(df, startCol, endCol, seriesCols, Seq(metricCol))

}
