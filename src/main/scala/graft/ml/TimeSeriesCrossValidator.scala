package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chronological k-fold splits for time-series model selection.
  *
  * Reference (/root/reference/python/tempo/ml.py:16-122): rows are ranked
  * with `ntile(k+1)` over `Window.partitionBy(seriesIds).orderBy(ts)`; fold i
  * trains on splits 0..i and tests on split i+1 (expanding window), with an
  * optional `gap` of rows trimmed off the train tail to avoid leakage.
  */
object TimeSeriesCrossValidator {

  /** Assign each row its chronological split index (0-based ntile over the
    * series window). */
  def withSplitIndex(df: DataFrame, tsCol: String, seriesIds: Seq[String],
      nSplits: Int, splitCol: String = "split_idx"): DataFrame = {
    val w = Window.partitionBy(seriesIds.map(col): _*).orderBy(col(tsCol).asc)
    df.withColumn(splitCol, ntile(nSplits).over(w) - 1)
  }

  /** Expanding-window folds: fold i = (train ⊇ splits 0..i, test = split
    * i+1). `gap` trims the most recent `gap` rows per series from each train
    * set. */
  def kFold(df: DataFrame, tsCol: String, seriesIds: Seq[String],
      nFolds: Int, gap: Int = 0): Seq[(DataFrame, DataFrame)] = {
    val split = withSplitIndex(df, tsCol, seriesIds, nFolds + 1, "__split")
    (0 until nFolds).map { i =>
      val train0 = split.filter(col("__split") <= i)
      val train =
        if (gap <= 0) train0
        else {
          val wDesc = Window.partitionBy(seriesIds.map(col): _*).orderBy(col(tsCol).desc)
          train0.withColumn("__rn_desc", row_number().over(wDesc))
            .filter(col("__rn_desc") > gap)
            .drop("__rn_desc")
        }
      val test = split.filter(col("__split") === i + 1)
      (train.drop("__split"), test.drop("__split"))
    }
  }
}
