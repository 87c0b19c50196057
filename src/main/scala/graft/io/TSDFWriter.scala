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
    * output file per date, order rows for page-stat pruning.
    *
    * `zorderCols` (2-3 numeric/timestamp columns): lay rows out along the
    * Z-curve of those keys instead of the lexicographic sort — multi-column
    * data skipping, the OSS equivalent of the reference's `OPTIMIZE ...
    * ZORDER BY` pass (io.py:26-61). Costs one extra min/max aggregate job
    * (see [[ZOrder.zvalue]]). */
  private def prepared(tsdf: TSDF, optimizationCols: Seq[String],
      zorderCols: Seq[String] = Seq.empty,
      curve: String = "zorder"): DataFrame = {
    val df = tsdf.df
      .withColumn("event_dt", to_date(tsdf.ts))
      .withColumn("event_time",
        date_format(tsdf.ts, "HHmmss").cast("double"))
    val sortCols =
      if (zorderCols.nonEmpty) curve match {
        case "zorder" => Seq(ZOrder.zvalue(df, zorderCols))
        case "hilbert" => Seq(ZOrder.hvalue(df, zorderCols))
        case other => throw new IllegalArgumentException(
          s"curve must be 'zorder' or 'hilbert', got '$other'")
      }
      else (tsdf.partitionCols ++ optimizationCols :+ tsdf.tsCol).map(col)
    df.repartition(col("event_dt"))
      .sortWithinPartitions(sortCols: _*)
  }

  /** `curve = "hilbert"` (2 layout columns only) lays rows on the Hilbert
    * curve instead of the Z-curve — Delta's `OPTIMIZE` offers the same
    * choice; see [[ZOrder.hvalue]] for why its envelopes are tighter. */
  def write(tsdf: TSDF, path: String, optimizationCols: Seq[String] = Seq.empty,
      format: String = "parquet", zorderCols: Seq[String] = Seq.empty,
      curve: String = "zorder"): Unit =
    prepared(tsdf, optimizationCols, zorderCols, curve)
      .write.format(format)
      .partitionBy("event_dt")
      .mode("overwrite")
      .save(path)

  /** Series-bucketed catalog table: `bucketBy(numBuckets, seriesCols)` +
    * `sortBy(series, ts)` — the layout that makes series-keyed analytics
    * shuffle-free at read time. A window/groupBy partitioned by the series
    * key, and an equi-join between two tables bucketed the same way, reuse
    * the on-disk hash-bucket placement instead of exchanging 100 TB
    * (plan-asserted in the spec: zero `Exchange hashpartitioning`). The
    * in-bucket (series, ts) sort also feeds sort-merge reads without a
    * re-sort. This is the long-lived-table complement of [[write]]'s
    * date-partitioned layout: partition by date for pruning when queries
    * slice time, bucket by series when queries group/join series. */
  def writeBucketedTable(tsdf: TSDF, tableName: String, numBuckets: Int,
      format: String = "parquet"): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    require(tsdf.partitionCols.nonEmpty, "bucketing needs series columns")
    tsdf.df.write.format(format)
      .bucketBy(numBuckets, tsdf.partitionCols.head, tsdf.partitionCols.tail: _*)
      .sortBy(tsdf.partitionCols.head,
        (tsdf.partitionCols.tail :+ tsdf.tsCol): _*)
      .mode("overwrite")
      .saveAsTable(tableName)
  }

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
      // dynamic overwrite needs the session conf (the per-write writer
      // option is not honored on the v1 insertInto path, and writeTo()
      // rejects v1 tables). Setting it on a session CLONE — shared catalog,
      // isolated conf — keeps concurrent writes/queries on the caller's
      // session from racing on the overwrite mode.
      val iso = spark.newSession()
      iso.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // insertInto matches columns by position: align with the table
      val cols = iso.table(tableName).columns
      org.apache.spark.sql.GraftColumns.inSession(iso, df)
        .select(cols.toIndexedSeq.map(col): _*)
        .write.mode("overwrite")
        .insertInto(tableName)
      // the insert refreshed the clone's view of the table; invalidate the
      // caller's cached file listing too
      spark.catalog.refreshTable(tableName)
    } else {
      df.write.format(format)
        .partitionBy("event_dt")
        .saveAsTable(tableName)
    }
  }
}
