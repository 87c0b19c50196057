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
  *  2. per target column, capture fill context on the RESAMPLED rows:
  *     previous non-null at-or-before, next non-null at-or-after, and next
  *     non-null strictly-after (for generated rows), via
  *     `last(when(v.isNotNull, struct(ts, v)), ignoreNulls)` windows;
  *  3. per series, generate missing buckets with
  *     `explode(sequence(ts, next_ts - freq, freq))` — one generated row per
  *     absent bucket, `is_ts_interpolated` flagging the synthetic ones, each
  *     spine row reading its pre-computed context (a generated row's prev is
  *     its segment head's inclusive-prev; its next is the head's
  *     strictly-after capture — no actual rows exist in between);
  *  4. fill: zero→0, null→null, ffill→prev, bfill→next, linear→
  *     `prev + (next - prev) * (t - prev_t) / (next_t - prev_t)`.
  *
  * Capturing context BEFORE the explode means both window sorts run over the
  * compact resampled rows — the dense spine (the ~freq× larger exploded
  * output) is never sorted at all, which at 100 TB is the difference between
  * sorting observations and sorting the gap-filled universe. One exchange on
  * the series keys; one asc + one desc sort (the strictly-after capture
  * rides the desc sort as a second frame).
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

    // ---- step 2: fill context on the compact resampled rows ----
    val wFwdCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRevCum = Window.partitionBy(series.map(col): _*).orderBy(col(tsCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // desc order + frame ending one row earlier = first non-null STRICTLY
    // after the current timestamp (what a generated row in (ts, next_ts)
    // needs — its next actual observation is exactly next_ts's)
    val wRevExcl = Window.partitionBy(series.map(col): _*).orderBy(col(tsCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ctx = targets.foldLeft(
      resampled.df.withColumn("__next_ts", lead(col(tsCol), 1).over(w))) { (df, c) =>
      val v = col(c)
      val obs = when(v.isNotNull, struct(col(tsCol).alias("t"), v.alias("v")))
      df.withColumn(s"__prev_$c", last(obs, ignoreNulls = true).over(wFwdCum))
        .withColumn(s"__nincl_$c", last(obs, ignoreNulls = true).over(wRevCum))
        .withColumn(s"__nexcl_$c", last(obs, ignoreNulls = true).over(wRevExcl))
    }

    // ---- step 3: dense spine via sequence-explode (interpol.py:399-417) ----
    val interval = expr(s"interval ${spec.sparkInterval}")
    val spine = ctx
      .withColumn("__new_ts",
        explode(sequence(col(tsCol),
          when(col("__next_ts").isNull, col(tsCol))
            .otherwise(col("__next_ts") - interval),
          interval)))
      .withColumn("is_ts_interpolated", col("__new_ts") =!= col(tsCol))

    // ---- step 4 per target column (no window touches the spine) ----
    val filled = targets.foldLeft(spine) { (df, c) =>
      // synthetic rows carry the source row's values — treat them as null
      val v = when(col("is_ts_interpolated"), lit(null)).otherwise(col(c))
      val prevS = col(s"__prev_$c")
      val nextS = when(col("is_ts_interpolated"), col(s"__nexcl_$c"))
        .otherwise(col(s"__nincl_$c"))
      val prevV = prevS.getField("v")
      val prevT = prevS.getField("t").cast(DoubleType)
      val nextV = nextS.getField("v")
      val nextT = nextS.getField("t").cast(DoubleType)
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
      df
        .withColumn(s"is_interpolated_$c", v.isNull)
        .withColumn(c, fillExpr)
        .drop(s"__prev_$c", s"__nincl_$c", s"__nexcl_$c")
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
