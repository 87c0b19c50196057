package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, TimestampType}

import graft.functions.MortonInterleave

/** Z-order sort key derivation: equal-width `width_bucket` ranks per key
  * column (one min/max stats job over the frame, no per-column sort), bit-
  * interleaved by the codegen'd [[graft.functions.MortonInterleave]].
  *
  * `sortWithinPartitions(zvalue)` then lays rows out along the Z-curve, so
  * parquet row-group min/max envelopes stay selective for predicates on ANY
  * of the keys — the OSS stand-in for Delta's `OPTIMIZE ... ZORDER BY`
  * (/root/reference/python/tempo/io.py:26-61), which this module exists to
  * replace (equal-width ranks vs Delta's sampled range ids: one cheap
  * aggregate instead of a sample pass, at the cost of skew sensitivity —
  * fine for the writer's (series, time) keys).
  */
object ZOrder {

  /** Max usable bits per key: 31 for 2 keys, 21 for 3 (63-bit budget). */
  private def bitsFor(n: Int): Int = if (n == 2) 31 else 21

  /** The Z-curve sort key for `cols` (2 or 3 numeric/timestamp columns).
    * Runs ONE aggregate job over `df` for the per-column min/max, then
    * returns a pure Column: rank_i = width_bucket(x_i, min_i, max_i, 2^bits)
    * clamped to [0, 2^bits), interleaved. Null and constant columns rank 0. */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.size == 2 || cols.size == 3,
      s"zorder takes 2 or 3 columns, got ${cols.size}")
    val b = math.min(bits, bitsFor(cols.size))
    org.apache.spark.sql.GraftColumns.column(
      MortonInterleave(bucketRanks(df, cols, b)
        .map(org.apache.spark.sql.GraftColumns.expression)))
  }

  /** Hilbert-curve sort key for exactly 2 columns — same equal-width rank
    * derivation as [[zvalue]], indexed by [[graft.functions.HilbertIndex]]
    * instead of the Morton interleave. Every curve step is Manhattan-
    * adjacent, so row-group min/max envelopes per dimension are at least
    * as tight as the Z-curve's (Delta's `OPTIMIZE` offers the same choice
    * of curves; reference io.py:26-61). */
  def hvalue(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.size == 2, s"hilbert takes exactly 2 columns, got ${cols.size}")
    val b = math.min(bits, 31)
    val Seq(x, y) = bucketRanks(df, cols, b)
    org.apache.spark.sql.GraftColumns.column(graft.functions.Hilbert2(b,
      org.apache.spark.sql.GraftColumns.expression(x),
      org.apache.spark.sql.GraftColumns.expression(y)))
  }

  /** Equal-width bucket ranks in [0, 2^bits) for each column — the shared
    * one-stats-job rank derivation of [[zvalue]]/[[hvalue]]. */
  private def bucketRanks(df: DataFrame, cols: Seq[String],
      b: Int): Seq[Column] = {
    val nb = 1L << b
    val keys = cols.map { c =>
      df.schema(c).dataType match {
        case _: NumericType => col(c).cast("double")
        case TimestampType => unix_micros(col(c)).cast("double")
        case other => throw new IllegalArgumentException(
          s"zorder column '$c' must be numeric or timestamp, got ${other.sql}")
      }
    }
    val statRow = df
      .agg(keys.flatMap(k => Seq(min(k), max(k))).head,
        keys.flatMap(k => Seq(min(k), max(k))).tail: _*)
      .head()
    keys.zipWithIndex.map { case (k, i) =>
      if (statRow.isNullAt(2 * i) || statRow.isNullAt(2 * i + 1)) lit(0L)
      else {
      val (lo, hi) = (statRow.getDouble(2 * i), statRow.getDouble(2 * i + 1))
      if (lo >= hi) lit(0L)
      else coalesce(
        least(lit(nb - 1), greatest(lit(0L),
          width_bucket(k, lit(lo), lit(hi), lit(nb)) - 1)),
        lit(0L))
      }
    }
  }
}
