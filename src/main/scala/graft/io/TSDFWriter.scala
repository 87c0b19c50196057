package graft.io

import graft.tsdf.TSDF
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-partitioned sink.
  *
  * Reference (/root/reference/python/tempo/io.py:15-62) writes Delta
  * partitioned by `event_dt` with an OPTIMIZE ZORDER pass — both
  * Databricks-specific. OSS-Spark equivalents:
  *   - [[write]]: parquet path partitioned by the derived event date, with
  *     `sortWithinPartitions` on (series, ts) so min/max page stats give the
  *     same data-skipping effect a Z-ORDER targets for time-range + series
  *     predicates;
  *   - [[writeTable]]: catalog table with *dynamic partition overwrite* —
  *     re-writing a slice replaces only the `event_dt` partitions present in
  *     the incoming data, the OSS stand-in for Delta's `replaceWhere`
  *     idempotent-backfill contract.
  */
object TSDFWriter {

  /** Shared shaping: derive the partition date + intra-day time, cluster one
    * output file per date, order rows for page-stat pruning. */
  private def prepared(tsdf: TSDF, optimizationCols: Seq[String]): DataFrame = {
    val df = tsdf.df
      .withColumn("event_dt", to_date(tsdf.ts))
      .withColumn("event_time",
        date_format(tsdf.ts, "HHmmss").cast("double"))
    val sortCols = (tsdf.partitionCols ++ optimizationCols :+ tsdf.tsCol).map(col)
    df.repartition(col("event_dt"))
      .sortWithinPartitions(sortCols: _*)
  }

  def write(tsdf: TSDF, path: String, optimizationCols: Seq[String] = Seq.empty,
      format: String = "parquet"): Unit =
    prepared(tsdf, optimizationCols)
      .write.format(format)
      .partitionBy("event_dt")
      .mode("overwrite")
      .save(path)

  /** Write to a catalog table, replacing only the partitions the incoming
    * data touches (io.py:40-51's `replaceWhere` semantics). First write
    * creates the partitioned table; subsequent writes `insertInto` under
    * `partitionOverwriteMode=dynamic`, so a daily backfill re-run is
    * idempotent and never clobbers other days. */
  def writeTable(tsdf: TSDF, tableName: String,
      optimizationCols: Seq[String] = Seq.empty,
      format: String = "parquet"): Unit = {
    val spark = tsdf.df.sparkSession
    val df = prepared(tsdf, optimizationCols)
    if (spark.catalog.tableExists(tableName)) {
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try {
        // insertInto matches columns by position: align with the table
        val cols = spark.table(tableName).columns
        df.select(cols.toIndexedSeq.map(col): _*).write.mode("overwrite").insertInto(tableName)
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    } else {
      df.write.format(format)
        .partitionBy("event_dt")
        .saveAsTable(tableName)
    }
  }
}
