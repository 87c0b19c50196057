package graft.intervals

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Split overlapping intervals into a disjoint cover per series. */
  def makeDisjoint(): IntervalsDF = {
    // Empty seriesIds would reduce the cover-join condition to a pure range
    // predicate — a BroadcastNestedLoopJoin over all segments × all
    // intervals. A constant dummy group key keeps it an equi-join (the data
    // is semantically one series, so the single resulting group is inherent,
    // as in the reference's single-group path).
    if (seriesIds.isEmpty) {
      val out = copy(df = df.withColumn("__grp_all", lit(0)),
        seriesIds = Seq("__grp_all")).makeDisjoint()
      return copy(df = out.df.drop("__grp_all"))
    }
    val ms = metricCols
    val series = seriesIds.map(col)

    // 1. distinct boundary points per series → elementary segments
    val boundaries = df
      .select(series :+ explode(array(col(startTs), col(endTs))).alias("__b"): _*)
      .distinct()
    val wb = Window.partitionBy(series: _*).orderBy(col("__b"))
    val segments = boundaries
      .withColumn("__b2", lead(col("__b"), 1).over(wb))
      .filter(col("__b2").isNotNull)

    // 2. segments ⋈ covering intervals (overlap: seg.start < i.end ∧ seg.end > i.start)
    val i = df.alias("i")
    val s = segments.alias("s")
    val joinCond = seriesIds.map(c => col(s"s.$c") === col(s"i.$c")).reduceOption(_ && _)
      .getOrElse(lit(true)) &&
      col("s.__b") < col(s"i.$endTs") && col("s.__b2") > col(s"i.$startTs")

    // 3. merge metrics: latest non-null wins in (start, end) interval order
    val merged = s.join(i, joinCond, "inner")
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
}

object IntervalsDF {

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
