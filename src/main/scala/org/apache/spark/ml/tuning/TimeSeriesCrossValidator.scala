package org.apache.spark.ml.tuning

import org.apache.spark.ml.Model
import org.apache.spark.ml.param.{IntParam, Param, ParamValidators, StringArrayParam}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}

/** Drop-in [[CrossValidator]] with chronological (expanding-window) folds.
  *
  * Reference semantics: /root/reference/python/tempo/ml.py:16-122 — rows are
  * split with ntile over (seriesIdCols, timeSeriesCol) order; fold i trains
  * on splits 0..i and tests on split i+1, with an optional `gap` of rows
  * trimmed off each training tail to avoid leakage. Everything else — the
  * estimator/evaluator/param-grid contract, metric averaging, best-model
  * refit — matches `CrossValidator.fit`, so the class drops into any
  * spark.ml pipeline where random k-fold would leak future data.
  *
  * Lives in the spark.ml.tuning package because [[CrossValidatorModel]]'s
  * constructor is private[ml]; the fold logic itself is the shared
  * implementation in [[graft.ml.TimeSeriesCrossValidator]].
  */
class TimeSeriesCrossValidator(override val uid: String) extends CrossValidator {

  def this() = this(Identifiable.randomUID("tsCrossVal"))

  val timeSeriesCol: Param[String] =
    new Param(this, "timeSeriesCol", "name of the time series (ordering) column")
  val seriesIdCols: StringArrayParam =
    new StringArrayParam(this, "seriesIdCols", "series identifier columns")
  val gap: IntParam =
    new IntParam(this, "gap",
      "rows trimmed off each training tail (leakage guard)", ParamValidators.gtEq(0))

  setDefault(timeSeriesCol -> "event_ts", seriesIdCols -> Array.empty[String], gap -> 0)

  def getTimeSeriesCol: String = $(timeSeriesCol)
  def getSeriesIdCols: Seq[String] = $(seriesIdCols).toSeq
  def getGap: Int = $(gap)
  def setTimeSeriesCol(v: String): this.type = set(timeSeriesCol, v)
  def setSeriesIdCols(v: Seq[String]): this.type = set(seriesIdCols, v.toArray)
  def setGap(v: Int): this.type = set(gap, v)

  /** Chronological folds (ml.py:79-119) — public so callers can inspect or
    * reuse the splits outside a fit. */
  def tsKFold(dataset: DataFrame): Seq[(DataFrame, DataFrame)] =
    _root_.graft.ml.TimeSeriesCrossValidator.kFold(
      dataset, $(timeSeriesCol), getSeriesIdCols, $(numFolds), $(gap))

  override def fit(dataset: Dataset[_]): CrossValidatorModel = {
    transformSchema(dataset.schema, logging = true)
    val est = $(estimator)
    val eval = $(evaluator)
    val epm = $(estimatorParamMaps)
    val folds = tsKFold(dataset.toDF())
    val metrics = new Array[Double](epm.length)
    // honor the inherited `parallelism` param like upstream CrossValidator:
    // param maps within a fold fit/evaluate concurrently on its executor
    // (parallelism = 1 degrades to the same-thread context)
    val ec = getExecutionContext
    folds.foreach { case (train, test) =>
      val futures = epm.toSeq.map { pm =>
        scala.concurrent.Future {
          val model = est.fit(train, pm).asInstanceOf[Model[_]]
          eval.evaluate(model.transform(test, pm))
        }(ec)
      }
      val foldMetrics = futures.map(f =>
        org.apache.spark.util.ThreadUtils.awaitResult(
          f, scala.concurrent.duration.Duration.Inf))
      var i = 0
      while (i < epm.length) {
        metrics(i) += foldMetrics(i) / folds.size
        i += 1
      }
    }
    val bestIndex =
      if (eval.isLargerBetter) metrics.indexOf(metrics.max)
      else metrics.indexOf(metrics.min)
    val bestModel = est.fit(dataset, epm(bestIndex)).asInstanceOf[Model[_]]
    copyValues(new CrossValidatorModel(uid, bestModel, metrics).setParent(this))
  }

  override def copy(extra: org.apache.spark.ml.param.ParamMap): TimeSeriesCrossValidator =
    defaultCopy[TimeSeriesCrossValidator](extra)
}
