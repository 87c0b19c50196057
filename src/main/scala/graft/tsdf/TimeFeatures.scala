package graft.tsdf

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Calendar feature extraction for training pipelines — the categorical
  * time covariates (day-of-week, hour, month, …) every tabular/forecasting
  * model conditions on.
  *
  * Engine-agnostic by construction: the sub-day fields come from exact
  * integer arithmetic on epoch-µs (`pmod`/integer division — no timezone
  * library in the path, UTC by definition), and the date fields use the
  * proleptic-Gregorian `year/month/dayofmonth`, which agree across engines
  * for CE timestamps. All outputs are integers/booleans, so results replay
  * bit-for-bit in any SQL engine. Deliberately absent: sin/cos cyclical
  * encodings (libm trig is not correctly rounded — derive them downstream
  * if a model wants them) and ISO week numbers (engines disagree on the
  * year-boundary convention).
  *
  * Pure column algebra — zero shuffle, stays in whole-stage codegen.
  * Precondition: timestamps at/after the epoch (1970+); the integer
  * divisions below truncate toward zero, which equals floor only for
  * non-negative µs. */
object TimeFeatures {

  /** Exact integer division for non-negative operands: (a − a mod d) / d
    * stays in long arithmetic (no double rounding anywhere). */
  private def intDiv(a: Column, d: Long): Column =
    ((a - pmod(a, lit(d))) / lit(d)).cast(LongType)

  /** The calendar feature set for a timestamp column, in a fixed order:
    * year, month, day, quarter, hour, minute, dow (Monday = 0),
    * is_weekend. */
  def calendar(ts: Column): Seq[Column] = {
    val us = unix_micros(ts)
    val dayIdx = intDiv(us, 86400000000L)
    val dow = pmod(dayIdx + 3, lit(7L)) // 1970-01-01 was a Thursday (= 3)
    Seq(
      year(ts).cast(LongType).alias("year"),
      month(ts).cast(LongType).alias("month"),
      dayofmonth(ts).cast(LongType).alias("day"),
      intDiv(month(ts).cast(LongType) + 2, 3L).alias("quarter"),
      pmod(intDiv(us, 3600000000L), lit(24L)).alias("hour"),
      pmod(intDiv(us, 60000000L), lit(60L)).alias("minute"),
      dow.alias("dow"),
      (dow >= 5).alias("is_weekend"))
  }
}
