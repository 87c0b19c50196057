package graft.tsdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gap filling / interpolation over resampled series.
  *
  * Methods: `zero | null | ffill | bfill | linear`
  * (/root/reference/python/tempo/interpol.py:15-31).
  *
  * Pipeline (interpol.py:304-448, re-expressed as pure DataFrame algebra):
  *  1. resample to the target freq if not already resampled;
  *  2. per series, generate missing buckets with
  *     `explode(sequence(ts, next_ts - freq, freq))` — one generated row per
  *     absent bucket, `is_ts_interpolated` flagging the synthetic ones;
  *  3. per target column, locate the previous and next non-null observation
  *     with `last(when(v.isNotNull, struct(ts, v)), ignoreNulls)` over a
  *     forward and a reverse-ordered unbounded-preceding window;
  *  4. fill: zero→0, null→null, ffill→prev, bfill→next, linear→
  *     `prev + (next - prev) * (t - prev_t) / (next_t - prev_t)`.
  *
  * All windows share the one hash-partition exchange on the series keys; the
  * reverse-ordered window costs one extra sort within partitions (noted in
  * SURVEY §4) — unavoidable without losing bfill semantics.
  */
object Interpolation {

  val Methods = Set("zero", "null", "ffill", "bfill", "linear")

  def interpolate(
      tsdf: TSDF,
      method: String,
      freqOpt: Option[String],
      funcOpt: Option[String],
      targetColsOpt: Option[Seq[String]],
      showInterpolated: Boolean): TSDF = {

    require(Methods.contains(method), s"method '$method' not in $Methods")

    // default freq/func from a prior resample (_ResampledTSDF, tsdf.py:1654-1658)
    val freq = freqOpt.orElse(tsdf.resampleSpec.map(_.freq)).getOrElse(
      throw new IllegalArgumentException("freq required when input is not resampled"))
    val func = funcOpt.orElse(tsdf.resampleSpec.map(_.func)).getOrElse("mean")

    val resampled =
      if (tsdf.resampleSpec.isDefined) tsdf
      else Resample.aggregate(tsdf, freq, func)

    // default = every observational column, numeric or not (tsdf.py:1331-1333)
    val targets = targetColsOpt.getOrElse(resampled.observationalCols)
    // linear/zero require numeric targets (interpol.py:104-113)
    if (method == "linear" || method == "zero") {
      val types = resampled.df.schema.fields.map(f => f.name -> f.dataType).toMap
      targets.foreach(c => require(types(c).isInstanceOf[NumericType],
        s"method '$method' requires numeric column, got $c: ${types(c)}"))
    }

    val spec = Resample.parseFreq(freq)
    val series = resampled.partitionCols
    val tsCol = resampled.tsCol
    val w = Window.partitionBy(series.map(col): _*).orderBy(col(tsCol).asc)

    // ---- step 2: dense spine via sequence-explode (interpol.py:399-417) ----
    val withNext = resampled.df.withColumn("__next_ts", lead(col(tsCol), 1).over(w))
    val interval = expr(s"interval ${spec.sparkInterval}")
    val spine = withNext
      .withColumn("__new_ts",
        explode(sequence(col(tsCol),
          when(col("__next_ts").isNull, col(tsCol))
            .otherwise(col("__next_ts") - interval),
          interval)))
      .withColumn("is_ts_interpolated", col("__new_ts") =!= col(tsCol))

    // synthetic rows carry the source row's values — null them out
    val cleared = targets.foldLeft(spine) { (df, c) =>
      df.withColumn(c, when(col("is_ts_interpolated"), lit(null)).otherwise(col(c)))
    }

    val wFwd = Window.partitionBy(series.map(col): _*)
      .orderBy(col("__new_ts").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRev = Window.partitionBy(series.map(col): _*)
      .orderBy(col("__new_ts").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // ---- steps 3+4 per target column ----
    val filled = targets.foldLeft(cleared) { (df, c) =>
      val v = col(c)
      val prevS = last(when(v.isNotNull, struct(col("__new_ts").alias("t"), v.alias("v"))),
        ignoreNulls = true).over(wFwd)
      val nextS = last(when(v.isNotNull, struct(col("__new_ts").alias("t"), v.alias("v"))),
        ignoreNulls = true).over(wRev)
      val df1 = df
        .withColumn(s"__prev_$c", prevS)
        .withColumn(s"__next_$c", nextS)
      val prevV = col(s"__prev_$c").getField("v")
      val prevT = col(s"__prev_$c").getField("t").cast(DoubleType)
      val nextV = col(s"__next_$c").getField("v")
      val nextT = col(s"__next_$c").getField("t").cast(DoubleType)
      val t = col("__new_ts").cast(DoubleType)
      val fillExpr: Column = method match {
        case "zero"  => coalesce(v, lit(0.0))
        case "null"  => v
        case "ffill" => coalesce(v, prevV)
        case "bfill" => coalesce(v, nextV)
        case "linear" =>
          when(v.isNotNull, v.cast(DoubleType))
            .when(prevV.isNotNull && nextV.isNotNull,
              // ratio computed first: (t-pt)/(nt-pt) is scale-invariant, so an
              // oracle computing the same ratio in epoch-µs gets the same bits
              prevV.cast(DoubleType) +
                (nextV.cast(DoubleType) - prevV.cast(DoubleType)) *
                ((t - prevT) / (nextT - prevT)))
            .otherwise(lit(null).cast(DoubleType))
      }
      df1
        .withColumn(s"is_interpolated_$c", v.isNull)
        .withColumn(c, fillExpr)
        .drop(s"__prev_$c", s"__next_$c")
    }

    val flagCols =
      if (showInterpolated) Seq("is_ts_interpolated") ++ targets.map(c => s"is_interpolated_$c")
      else Seq.empty
    val outCols = (series :+ "__new_ts").map(col) ++
      targets.map(col) ++ flagCols.map(col)
    val out = filled.select(outCols: _*).withColumnRenamed("__new_ts", tsCol)

    TSDF(out, tsCol, series, None, resampleSpec = Some(ResampleSpec(freq, func)))
  }
}
