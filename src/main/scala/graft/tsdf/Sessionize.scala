package graft.tsdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization: split each series into sessions at inactivity gaps —
  * the standard first step of clickstream/training-log pipelines (beyond
  * the reference surface, which stops at state-interval runs;
  * cf. /root/reference/python/tempo/tsdf.py:1497-1616 for the related
  * equality-run operator).
  *
  * Gaps-and-islands in two window passes over one series exchange: mark a
  * session break where the gap from the previous observation exceeds
  * `gapSeconds`, then a running sum of breaks yields a dense 0-based
  * session id per series. Exact integer-µs comparisons, so the assignment
  * is engine-reproducible. */
object Sessionize {

  /** Per-row 0-based `session_id` within its series. */
  def assign(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*).orderBy(col(tsCol))
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val isBreak =
      when(prev.isNull || us - prev > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(isBreak).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
  }

  /** One row per (series, session): start/end timestamps + event count.
    * A plain partial+final aggregate over [[assign]]'s output. */
  def intervals(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      gapSeconds: Long): DataFrame =
    assign(df, tsCol, seriesCols, gapSeconds)
      .groupBy((seriesCols :+ "session_id").map(col): _*)
      .agg(min(col(tsCol)).alias("session_start"),
        max(col(tsCol)).alias("session_end"),
        count(lit(1)).alias("n_events"))
}
