package graft.intervals

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DataFrame of time intervals: `[startTs, endTs)` boundaries + series ids +
  * metric columns (auto-detected: numeric or boolean, as in
  * /root/reference/python/tempo/intervals.py:26-38,131-133).
  *
  * The flagship operation `makeDisjoint` splits every set of overlapping
  * intervals per series into a disjoint cover, merging metrics of overlapping
  * pieces (reference: a pandas sweep-line kernel via `applyInPandas`,
  * intervals.py:223-278,1070-1331).
  *
  * Spark-native redesign — instead of buffering each series in one worker
  * process (O(n²) per group in the reference), disjoint-ification is pure
  * relational algebra:
  *   1. elementary segments = consecutive pairs of the distinct boundary
  *      points per series (one window over the boundaries);
  *   2. join segments back to the intervals that cover them (equi-join on the
  *      series ids + range predicate);
  *   3. group by segment, merging each metric with "latest non-null wins" in
  *      (start, end) interval order — `max(when(m nonnull, struct(start, end,
  *      m)))`.
  * Every step is shuffle-partitioned by series id, scales with data volume,
  * and stays in whole-stage codegen — no per-group buffering.
  */
case class IntervalsDF(
    df: DataFrame,
    startTs: String = "start_ts",
    endTs: String = "end_ts",
    seriesIds: Seq[String] = Seq.empty) {

  def metricCols: Seq[String] =
    df.schema.fields.collect {
      case f if !Seq(startTs, endTs).contains(f.name) && !seriesIds.contains(f.name) &&
        (f.dataType.isInstanceOf[NumericType] || f.dataType == BooleanType) => f.name
    }.toSeq

  def window: org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(seriesIds.map(col): _*).orderBy(col(startTs), col(endTs))

  /** Overlapping-interval join against `other` on the shared series ids:
    * one row per pair of intervals with `start < other.end AND other.start
    * < end` (half-open convention — touching endpoints do not overlap),
    * carrying both payloads plus the intersection bounds.
    *
    * The naive theta-join is a per-series cross product — quadratic in the
    * busiest series. Here each interval explodes into the fixed-width time
    * bins it covers and candidates pair through a plain (series, bin)
    * EQUI-join — the standard scalable range-join decomposition, which
    * shuffles on uniformly-distributed bin keys instead of nesting loops.
    * A pair spanning several shared bins is emitted exactly ONCE, by the
    * bin containing the overlap's start — a filter, not a distinct pass.
    * Pick `binSeconds` near the typical interval length: per-side explode
    * cost is span/bin rows per interval, and per-bin fan-in stays bounded
    * when bins are not much wider than intervals.
    *
    * Long-interval guard: an interval spanning more than
    * `maxBinsPerInterval` bins (a year-long outlier at 1 h bins is 8,760
    * rows) does NOT explode — such intervals route through a hybrid side:
    * they join the other side's intervals on the plain series equi-key with
    * the overlap predicate as a filter. Long intervals are assumed to be
    * outliers, so that side is small; AQE sees its runtime size and
    * broadcasts it (and when it is empty, propagates the empty relation so
    * the extra branches cost nothing). Without the guard a mixed workload
    * (mostly short + a few very long intervals) quietly goes quadratic-ish
    * in explode volume.
    *
    * Output: seriesIds ++ left payload ++ `right_`-prefixed right payload
    * ++ (overlap_start_ts, overlap_end_ts). */
  def overlapJoin(other: IntervalsDF, binSeconds: Long = 3600L,
      rightPrefix: String = "right_",
      maxBinsPerInterval: Long = 256L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    require(maxBinsPerInterval >= 1, "maxBinsPerInterval must be >= 1")
    require(seriesIds == other.seriesIds,
      s"series ids must match: $seriesIds vs ${other.seriesIds}")
    val w = binSeconds * 1000000L
    def prepared(iv: IntervalsDF, prefix: String, sTag: String, eTag: String) = {
      val payload = iv.df.columns.filterNot(iv.seriesIds.contains)
      val renamed = payload.foldLeft(iv.df) { (d, c) =>
        if (prefix.isEmpty) d else d.withColumnRenamed(c, prefix + c)
      }
      renamed
        .withColumn(sTag, unix_micros(col(prefix + iv.startTs)))
        .withColumn(eTag, unix_micros(col(prefix + iv.endTs)))
        .filter(col(eTag) > col(sTag))
        .withColumn("__nbins",
          expr(s"($eTag - 1) div $w - $sTag div $w + 1"))
    }
    def short(p: DataFrame, sTag: String, eTag: String) =
      p.filter(col("__nbins") <= maxBinsPerInterval)
        .withColumn("__bin",
          explode(sequence(expr(s"$sTag div $w"), expr(s"($eTag - 1) div $w"))))
    val lp = prepared(this, "", "__su", "__eu")
    val rp = prepared(other, rightPrefix, "__rsu", "__reu")
    val overlap = col("__su") < col("__reu") && col("__rsu") < col("__eu")
    def finish(joined: DataFrame): DataFrame = joined
      .filter(overlap)
      .withColumn("overlap_start_ts",
        timestamp_micros(greatest(col("__su"), col("__rsu"))))
      .withColumn("overlap_end_ts",
        timestamp_micros(least(col("__eu"), col("__reu"))))
      .drop("__bin", "__nbins", "__su", "__eu", "__rsu", "__reu")
    // short×short: the bin equi-join, each pair emitted by its overlap-start bin
    val a = finish(short(lp, "__su", "__eu")
      .join(short(rp, "__rsu", "__reu").drop("__nbins"), seriesIds :+ "__bin", "inner")
      .filter(expr(s"greatest(__su, __rsu) div $w") === col("__bin")))
    // long-left × all-right, short-left × long-right: series equi-join;
    // the three branches partition the pair space, so a plain union (no
    // distinct) keeps each pair exactly once
    val b = finish(lp.filter(col("__nbins") > maxBinsPerInterval).drop("__nbins")
      .join(rp.drop("__nbins"), seriesIds, "inner"))
    val c = finish(lp.filter(col("__nbins") <= maxBinsPerInterval).drop("__nbins")
      .join(rp.filter(col("__nbins") > maxBinsPerInterval).drop("__nbins"),
        seriesIds, "inner"))
    val cols = a.columns.toIndexedSeq.map(col)
    a.select(cols: _*).union(b.select(cols: _*)).union(c.select(cols: _*))
  }

  /** Point-in-interval join: one row per (point, interval) pair with
    * `start <= point.ts < end` on the shared series ids — the "tag every
    * event with its containing regime/session/maintenance window" step.
    * A point inside k overlapping intervals emits k rows; make the
    * intervals disjoint first ([[makeDisjoint]]) for at-most-one semantics.
    *
    * Same scalable decomposition as [[overlapJoin]]: intervals explode into
    * the fixed-width time bins they cover, each point computes its single
    * bin, and candidates pair through a plain (series, bin) EQUI-join — a
    * point's bin is unique, so each qualifying pair matches exactly one bin
    * row and no dedup pass exists. Intervals spanning more than
    * `maxBinsPerInterval` bins skip the explode and route through the
    * hybrid series-keyed side (assumed rare ⇒ AQE broadcasts it), so one
    * year-long outlier cannot inflate explode volume.
    *
    * Output: seriesIds ++ point payload ++ `prefix`-renamed interval
    * payload. */
  def pointJoin(points: DataFrame, pointTs: String, binSeconds: Long = 3600L,
      prefix: String = "interval_",
      maxBinsPerInterval: Long = 256L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    require(maxBinsPerInterval >= 1, "maxBinsPerInterval must be >= 1")
    require(seriesIds.forall(points.columns.contains),
      s"points must carry the series id columns $seriesIds")
    val w = binSeconds * 1000000L
    val ivPayload = df.columns.filterNot(seriesIds.contains)
    val iv = ivPayload.foldLeft(df)((d, c) => d.withColumnRenamed(c, prefix + c))
      .withColumn("__su", unix_micros(col(prefix + startTs)))
      .withColumn("__eu", unix_micros(col(prefix + endTs)))
      .filter(col("__eu") > col("__su"))
      .withColumn("__nbins", expr(s"(__eu - 1) div $w - __su div $w + 1"))
    val pts = points
      .withColumn("__pu", unix_micros(col(pointTs)))
      .withColumn("__bin", expr(s"__pu div $w"))
    val contains = col("__su") <= col("__pu") && col("__pu") < col("__eu")
    def finish(joined: DataFrame): DataFrame = joined.filter(contains)
      .drop("__bin", "__nbins", "__su", "__eu", "__pu")
    val short = finish(pts.join(
      iv.filter(col("__nbins") <= maxBinsPerInterval)
        .withColumn("__bin",
          explode(sequence(expr(s"__su div $w"), expr(s"(__eu - 1) div $w"))))
        .drop("__nbins"),
      seriesIds :+ "__bin", "inner"))
    val long = finish(pts.drop("__bin").join(
      iv.filter(col("__nbins") > maxBinsPerInterval).drop("__nbins"),
      seriesIds, "inner"))
    val cols = short.columns.toIndexedSeq.map(col)
    short.select(cols: _*).union(long.select(cols: _*))
  }

  /** Interval set algebra on COVERAGE: both sides are read as the union of
    * their half-open intervals per series (self-overlaps and duplicates
    * are fine — only covered-or-not matters), and the result is the
    * maximal disjoint intervals of `A ∩ B` ([[intersectCoverage]]) or
    * `A \ B` ([[subtractCoverage]]). Metric columns do not survive set
    * algebra and are dropped; output schema = seriesIds + (startTs,
    * endTs).
    *
    * Execution is a boundary-delta sweep, all relational: each interval
    * contributes (+1 at start, −1 at end) to its side's running depth;
    * elementary segments between consecutive boundary rows keep
    * depth-based membership (`A ∩ B`: both depths > 0; `A \ B`: left
    * depth > 0, right = 0), and adjacent kept segments coalesce via an
    * island window. NO join and NO explode beyond the fixed 2 rows per
    * interval — boundary volume is linear in interval count, every window
    * rides ONE series exchange (the island merge reuses the same hash
    * partitioning), and ties at equal boundary timestamps resolve
    * order-independently (intermediate rows at a shared t are zero-width
    * and filtered; the surviving row carries the full delta sum, which is
    * commutative). Scales to arbitrarily deep overlap where a pairwise
    * approach (overlapJoin + dedup) would be quadratic in depth. */
  def intersectCoverage(other: IntervalsDF): IntervalsDF =
    coverageAlgebra(other, (da, db) => da > 0 && db > 0)

  /** `A \ B` on coverage — see [[intersectCoverage]] for semantics and
    * the sweep plan. */
  def subtractCoverage(other: IntervalsDF): IntervalsDF =
    coverageAlgebra(other, (da, db) => da > 0 && db === 0)

  private def coverageAlgebra(other: IntervalsDF,
      keep: (Column, Column) => Column): IntervalsDF = {
    require(seriesIds == other.seriesIds,
      s"series ids must match: $seriesIds vs ${other.seriesIds}")
    require(seriesIds.nonEmpty,
      "coverage algebra needs at least one series id column")
    def deltas(iv: IntervalsDF, mine: Boolean) = {
      val su = unix_micros(col(iv.startTs))
      val eu = unix_micros(col(iv.endTs))
      val d = (dd: Column) => if (mine) dd else lit(0L)
      val o = (dd: Column) => if (mine) lit(0L) else dd
      iv.df.filter(eu > su)
        .select(seriesIds.map(col) :+ explode(array(
          struct(su.alias("t"), lit(1L).alias("dd")),
          struct(eu.alias("t"), lit(-1L).alias("dd")))).alias("__e"): _*)
        .select(seriesIds.map(col) ++ Seq(col("__e.t").alias("__t"),
          d(col("__e.dd")).alias("__da"), o(col("__e.dd")).alias("__db")): _*)
    }
    val sc = seriesIds.map(col)
    // ties at equal t break on the delta columns so the running depths and
    // lead() agree row-for-row in any engine (remaining ties are identical
    // rows, interchangeable under commutative sums)
    val ord = Window.partitionBy(sc: _*)
      .orderBy(col("__t"), col("__da"), col("__db"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val segs = deltas(this, mine = true)
      .unionByName(deltas(other, mine = false))
      .withColumn("__deptha", sum(col("__da")).over(run))
      .withColumn("__depthb", sum(col("__db")).over(run))
      .withColumn("__next", lead(col("__t"), 1).over(ord))
      .filter(col("__next") > col("__t") &&
        keep(col("__deptha"), col("__depthb")))
    val islOrd = Window.partitionBy(sc: _*).orderBy(col("__t"))
    val islRun = islOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = segs
      .withColumn("__new",
        when(col("__t") === lag(col("__next"), 1).over(islOrd), 0L)
          .otherwise(1L))
      .withColumn("__isl", sum(col("__new")).over(islRun))
      .groupBy(sc :+ col("__isl"): _*)
      .agg(min(col("__t")).alias("__s"), max(col("__next")).alias("__e"))
      .select(sc ++ Seq(timestamp_micros(col("__s")).alias(startTs),
        timestamp_micros(col("__e")).alias(endTs)): _*)
    IntervalsDF(merged, startTs, endTs, seriesIds)
  }

  /** Positional union (no dedup), intervals.py:280-300. */
  def union(other: IntervalsDF): IntervalsDF = copy(df = df.union(other.df))

  /** By-name union, intervals.py:302-339. */
  def unionByName(other: IntervalsDF): IntervalsDF = copy(df = df.unionByName(other.df))

  /** Wide→long unpivot via `stack` (intervals.py:341-380): one row per
    * (interval, metric), null metric values dropped. */
  def toStacked(nameCol: String = "metric_name", valueCol: String = "metric_value"): DataFrame = {
    // no explicit cast: stack() itself unifies the metric types, preserving
    // them when homogeneous (reference keeps the input type, intervals.py:360)
    val ms = metricCols
    val stackExpr = s"stack(${ms.size}, " +
      ms.map(m => s"'$m', $m").mkString(", ") +
      s") as ($nameCol, $valueCol)"
    df.select((seriesIds.map(col) :+ col(startTs) :+ col(endTs)) :+ expr(stackExpr): _*)
      .na.drop(Seq(valueCol))
  }

  /** Split overlapping intervals into a disjoint cover per series.
    *
    * Hybrid execution, chosen per series by max overlap depth (the running
    * +1/−1 sum over sorted boundary events): series at or below
    * `depthThreshold` run the relational segment×cover join, whose row count
    * is bounded by segments × depth; deeper series — e.g. one series of n
    * mutually-overlapping intervals, where that join is O(n²) — fall back to
    * an O(n·log n) per-series sweep-line in `flatMapGroups` that reproduces
    * the exact "max (start, end, value) struct wins" merge of the relational
    * path (differential-tested on random inputs). The depth probe and both
    * routing joins shuffle on the same series key as the main plan, and are
    * skipped entirely (one cheap count-aggregate action) when no series has
    * enough intervals to possibly exceed the threshold. */
  def makeDisjoint(depthThreshold: Int = IntervalsDF.DefaultDepthThreshold): IntervalsDF = {
    // Empty seriesIds would reduce the cover-join condition to a pure range
    // predicate — a BroadcastNestedLoopJoin over all segments × all
    // intervals. A constant dummy group key keeps it an equi-join (the data
    // is semantically one series, so the single resulting group is inherent,
    // as in the reference's single-group path).
    if (seriesIds.isEmpty) {
      val out = copy(df = df.withColumn("__grp_all", lit(0)),
        seriesIds = Seq("__grp_all")).makeDisjoint(depthThreshold)
      return copy(df = out.df.drop("__grp_all"))
    }
    val ms = metricCols
    val series = seriesIds.map(col)

    // overlap depth per series: the end event (−1) sorts before the start
    // event (+1) at an equal boundary, so touching intervals don't stack.
    // Depth is bounded by the series' interval count, so the windowed probe
    // only runs over series whose count exceeds the threshold (a cheap
    // partial+final aggregate prefilter) — for typical data the window
    // sorts nothing at all.
    val bigKeys = df.groupBy(series: _*).agg(count(lit(1)).alias("__cnt"))
      .filter(col("__cnt") > depthThreshold).select(series: _*)
    val work = df.select((seriesIds ++ Seq(startTs, endTs) ++ ms).map(col): _*)
    // One action on the tiny count aggregate decides routing: when NO series
    // has more intervals than the threshold (the common case), none can be
    // deep, so the window probe and both routing joins are skipped entirely
    // and the whole input takes the relational path unmodified.
    val merged = if (bigKeys.isEmpty) relationalMerge(work, ms) else {
      val wd = Window.partitionBy(series: _*).orderBy(col("__b"), col("__d"))
      val depths = df.join(bigKeys, seriesIds, "left_semi")
        .select(series :+ explode(array(
          struct(col(startTs).alias("__b"), lit(1).alias("__d")),
          struct(col(endTs).alias("__b"), lit(-1).alias("__d")))).alias("__e"): _*)
        .select(series :+ col("__e.__b").alias("__b") :+ col("__e.__d").alias("__d"): _*)
        .withColumn("__run", sum(col("__d")).over(
          wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(series: _*).agg(max(col("__run")).alias("__depth"))
      val deepKeys = depths.filter(col("__depth") > depthThreshold).select(series: _*)
      relationalMerge(work.join(deepKeys, seriesIds, "left_anti"), ms)
        .unionByName(sweepMerge(work.join(deepKeys, seriesIds, "left_semi"), ms))
    }

    // 4. coalesce adjacent segments whose metric vectors are identical
    //    (null-safe) — the issue-268 semantics (reference regression
    //    tests/intervals_tests.py:404): splitting must not fragment a region
    //    whose merged values are uniform. Gaps-and-islands over the segments.
    val wSeg = Window.partitionBy(series: _*).orderBy(col(startTs))
    val sameAsPrev = (ms.map(m => col(m) <=> lag(col(m), 1).over(wSeg)) :+
      (col(startTs) <=> lag(col(endTs), 1).over(wSeg))).reduce(_ && _)
    val islands = merged
      .withColumn("__brk", when(sameAsPrev, 0).otherwise(1))
      .withColumn("__grp", sum(col("__brk")).over(
        wSeg.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val coalesced = islands
      .groupBy((seriesIds :+ "__grp").map(col): _*)
      .agg(
        min(col(startTs)).alias(startTs),
        max(col(endTs)).alias(endTs) +: ms.map(m => first(col(m)).alias(m)): _*)
      .select(seriesIds.map(col) ++ Seq(col(startTs), col(endTs)) ++ ms.map(col): _*)

    copy(df = coalesced)
  }

  /** Relational merge (the default scale path): elementary segments joined
    * back to their covering intervals, metrics merged per segment. `work`
    * must be projected to seriesIds ++ (startTs, endTs) ++ ms. */
  private def relationalMerge(work: DataFrame, ms: Seq[String]): DataFrame = {
    val series = seriesIds.map(col)

    // 1. distinct boundary points per series → elementary segments
    val boundaries = work
      .select(series :+ explode(array(col(startTs), col(endTs))).alias("__b"): _*)
      .distinct()
    val wb = Window.partitionBy(series: _*).orderBy(col("__b"))
    val segments = boundaries
      .withColumn("__b2", lead(col("__b"), 1).over(wb))
      .filter(col("__b2").isNotNull)

    // 2. segments ⋈ covering intervals (overlap: seg.start < i.end ∧ seg.end > i.start)
    val i = work.alias("i")
    val s = segments.alias("s")
    val joinCond = seriesIds.map(c => col(s"s.$c") === col(s"i.$c")).reduce(_ && _) &&
      col("s.__b") < col(s"i.$endTs") && col("s.__b2") > col(s"i.$startTs")

    // 3. merge metrics: latest non-null wins in (start, end) interval order
    s.join(i, joinCond, "inner")
      .groupBy(seriesIds.map(c => col(s"s.$c")) :+ col("s.__b") :+ col("s.__b2"): _*)
      .agg(
        ms.map(m => max(when(col(s"i.$m").isNotNull,
          struct(col(s"i.$startTs"), col(s"i.$endTs"), col(s"i.$m").alias("v"))))
          .getField("v").alias(m)).head,
        ms.map(m => max(when(col(s"i.$m").isNotNull,
          struct(col(s"i.$startTs"), col(s"i.$endTs"), col(s"i.$m").alias("v"))))
          .getField("v").alias(m)).tail: _*)
      .select(seriesIds.map(col) ++
        Seq(col("__b").alias(startTs), col("__b2").alias(endTs)) ++ ms.map(col): _*)
  }

  /** Sweep-line merge for series past the overlap-depth threshold: one pass
    * over the sorted boundaries with a lazy-deletion heap per metric, each
    * ordered by (start, end, value) so the heap top IS the relational
    * `max(struct(start, end, value))` winner for the current segment.
    * O(n·log n) per series and O(n) memory — a single pathological series
    * stays a single task instead of an O(n²) join blow-up. */
  private def sweepMerge(work: DataFrame, ms: Seq[String]): DataFrame = {
    import scala.collection.mutable
    val nS = seriesIds.length
    val startI = nS
    val endI = nS + 1
    // metrics become nullable: a segment covered only by intervals whose
    // metric is null merges to null even if the input field was non-nullable
    val schema = StructType(work.schema.fields.zipWithIndex.map { case (f, i) =>
      if (i >= nS + 2) f.copy(nullable = true) else f
    })
    val keySchema = StructType(schema.fields.take(nS))
    val cmp = new Ordering[Any] with Serializable {
      def compare(a: Any, b: Any): Int = a.asInstanceOf[Comparable[Any]].compareTo(b)
    }
    work
      .groupByKey((r: Row) => Row.fromSeq(r.toSeq.take(nS)))(Encoders.row(keySchema))
      .flatMapGroups { (key: Row, it: Iterator[Row]) =>
        val rows = it.toArray
        val nM = ms.length
        val bounds =
          (rows.map(_.get(startI)) ++ rows.map(_.get(endI))).distinct.sorted(cmp)
        val byStart = rows.sortBy(_.get(startI))(cmp)
        val winnerOrd = (mi: Int) => new Ordering[Row] {
          def compare(x: Row, y: Row): Int = {
            var c = cmp.compare(x.get(startI), y.get(startI))
            if (c == 0) c = cmp.compare(x.get(endI), y.get(endI))
            if (c == 0) c = cmp.compare(x.get(mi), y.get(mi))
            c
          }
        }
        val winners =
          Array.tabulate(nM)(m => mutable.PriorityQueue.empty[Row](winnerOrd(nS + 2 + m)))
        // min-heap on end: head is the earliest-expiring active interval
        val coverage = mutable.PriorityQueue.empty[Row](
          Ordering.fromLessThan[Row]((x, y) => cmp.compare(x.get(endI), y.get(endI)) > 0))
        val out = mutable.ArrayBuffer.empty[Row]
        var ptr = 0
        var k = 0
        while (k < bounds.length - 1) {
          val b = bounds(k)
          while (ptr < byStart.length && cmp.compare(byStart(ptr).get(startI), b) <= 0) {
            val r = byStart(ptr)
            if (cmp.compare(r.get(endI), b) > 0) { // skip empty [a, a) intervals
              coverage.enqueue(r)
              var m = 0
              while (m < nM) { if (!r.isNullAt(nS + 2 + m)) winners(m).enqueue(r); m += 1 }
            }
            ptr += 1
          }
          while (coverage.nonEmpty && cmp.compare(coverage.head.get(endI), b) <= 0)
            coverage.dequeue()
          if (coverage.nonEmpty) {
            val vals = new Array[Any](nS + 2 + nM)
            var i = 0
            while (i < nS) { vals(i) = key.get(i); i += 1 }
            vals(startI) = b
            vals(endI) = bounds(k + 1)
            var m = 0
            while (m < nM) {
              val h = winners(m)
              while (h.nonEmpty && cmp.compare(h.head.get(endI), b) <= 0) h.dequeue()
              vals(nS + 2 + m) = if (h.nonEmpty) h.head.get(nS + 2 + m) else null
              m += 1
            }
            out += Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
          }
          k += 1
        }
        out.iterator
      }(Encoders.row(schema))
  }
}

object IntervalsDF {

  /** Max per-series overlap depth served by the relational cover join; the
    * join produces at most segments × depth rows, so this bounds the blow-up
    * at ~512× before a series is handed to the sweep-line fallback. */
  val DefaultDepthThreshold = 256

  /** Long→wide pivot (intervals.py:139-221): one row per interval, one column
    * per metric name. Passing `metricNames` explicitly skips the extra
    * distinct job Spark needs to discover pivot values. */
  def fromStackedMetrics(
      df: DataFrame,
      startTs: String,
      endTs: String,
      seriesIds: Seq[String],
      metricNameCol: String,
      metricValueCol: String,
      metricNames: Seq[String] = Seq.empty): IntervalsDF = {
    val grouped = df.groupBy((Seq(startTs, endTs) ++ seriesIds).map(col): _*)
    val pivoted =
      if (metricNames.nonEmpty) grouped.pivot(metricNameCol, metricNames)
      else grouped.pivot(metricNameCol)
    IntervalsDF(pivoted.max(metricValueCol), startTs, endTs, seriesIds)
  }
}
