package graft.io

import graft.tsdf.TSDF
import org.apache.spark.sql.functions._

/** Time-partitioned sink.
  *
  * Reference (/root/reference/python/tempo/io.py:15-62) writes Delta
  * partitioned by `event_dt` with an OPTIMIZE ZORDER pass — both
  * Databricks-specific. OSS-Spark equivalent: parquet partitioned by the
  * derived event date, with `sortWithinPartitions` on (series, ts) so
  * min/max page stats give the same data-skipping effect a Z-ORDER targets
  * for time-range + series predicates.
  */
object TSDFWriter {

  def write(tsdf: TSDF, path: String, optimizationCols: Seq[String] = Seq.empty,
      format: String = "parquet"): Unit = {
    val df = tsdf.df
      .withColumn("event_dt", to_date(tsdf.ts))
      .withColumn("event_time",
        date_format(tsdf.ts, "HHmmss").cast("double"))
    val sortCols = (tsdf.partitionCols ++ optimizationCols :+ tsdf.tsCol).map(col)
    df.repartition(col("event_dt"))
      .sortWithinPartitions(sortCols: _*)
      .write.format(format)
      .partitionBy("event_dt")
      .mode("overwrite")
      .save(path)
  }
}
