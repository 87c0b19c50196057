package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.ml.tuning.{ParamGridBuilder, TimeSeriesCrossValidator => TSCV}
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The chronological cross-validator as a real spark.ml component: folds are
  * expanding windows in time order (reference ml.py:16-122), and the class
  * drops into an estimator + param-grid + evaluator fit. */
class TimeSeriesCrossValidatorSpec extends SparkTestBase {

  private def syntheticSeries = {
    import spark.implicits._
    // y = 2x + noise-free linear series per group, 40 points each
    (0 until 80).map { i =>
      val g = i % 2
      val t = i / 2
      (g.toString, t.toLong, t.toDouble, 2.0 * t + g)
    }.toDF("series_id", "event_ts", "x", "label")
  }

  test("tsKFold produces chronological expanding-window folds") {
    val folds = new TSCV()
      .setTimeSeriesCol("event_ts")
      .setSeriesIdCols(Seq("series_id"))
      .setNumFolds(3)
      .tsKFold(syntheticSeries)
    assert(folds.size == 3)
    folds.foreach { case (train, test) =>
      val maxTrain = train.groupBy("series_id").agg(max("event_ts").alias("m"))
      val minTest = test.groupBy("series_id").agg(min("event_ts").alias("m"))
      val leaked = maxTrain.alias("a").join(minTest.alias("b"), "series_id")
        .filter(col("a.m") >= col("b.m")).count()
      assert(leaked == 0, "train must end strictly before test begins per series")
    }
    // expanding: each fold's train grows
    val sizes = folds.map(_._1.count())
    assert(sizes == sizes.sorted)
  }

  test("gap trims the tail of each training fold") {
    val noGap = new TSCV().setTimeSeriesCol("event_ts")
      .setSeriesIdCols(Seq("series_id")).setNumFolds(3).tsKFold(syntheticSeries)
    val withGap = new TSCV().setTimeSeriesCol("event_ts")
      .setSeriesIdCols(Seq("series_id")).setNumFolds(3).setGap(2)
      .tsKFold(syntheticSeries)
    noGap.zip(withGap).foreach { case ((t0, _), (t1, _)) =>
      // 2 series × gap 2 = 4 rows trimmed
      assert(t0.count() - t1.count() == 4)
    }
  }

  test("fits an estimator over a param grid with chronological folds") {
    val data = new VectorAssembler()
      .setInputCols(Array("x")).setOutputCol("features")
      .transform(syntheticSeries)
    val lr = new LinearRegression().setLabelCol("label").setFeaturesCol("features")
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.0, 10.0))
      .build()
    val cv = new TSCV()
      .setTimeSeriesCol("event_ts")
      .setSeriesIdCols(Seq("series_id"))
      .setNumFolds(3)
      .setEstimator(lr)
      .setEstimatorParamMaps(grid)
      .setEvaluator(new RegressionEvaluator().setMetricName("rmse")
        .setLabelCol("label"))
    val model = cv.fit(data)
    assert(model.avgMetrics.length == 2)
    // the unregularized fit of a perfectly linear series must win
    assert(model.avgMetrics(0) < model.avgMetrics(1))
    val best = model.bestModel.asInstanceOf[org.apache.spark.ml.regression.LinearRegressionModel]
    assert(math.abs(best.coefficients(0) - 2.0) < 1e-6)
  }
}
