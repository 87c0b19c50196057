package graft.tsdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{GoldenFixtures, SparkTestBase}

/** Golden tests ported from the reference TSDF suite
  * (/root/reference/python/tests/tsdf_tests.py, fixtures tsdf_tests.json):
  * time slicing, rolling/grouped stats, resample/bars, state intervals and
  * the Fourier transform. */
class TsdfGoldenSpec extends SparkTestBase {

  private lazy val fx = new GoldenFixtures(spark, "tsdf_tests.json")

  // ------------------------------------------------------------- slicing
  private def sliceCase(name: String)(op: TSDF => TSDF): Unit =
    test(s"slicing: $name") {
      val t = fx.testCase("TSDFBaseTests", name)
      assertDfEquality(op(fx.tsdf(t.get("init"))).df, fx.df(t.get("expected")))
    }

  private val targetTs = "2020-09-01 00:02:10"

  sliceCase("test_at_string_timestamp")(_.at(targetTs))
  sliceCase("test_before_string_timestamp")(_.before(targetTs))
  sliceCase("test_atOrBefore_string_timestamp")(_.atOrBefore(targetTs))
  sliceCase("test_after_string_timestamp")(_.after(targetTs))
  sliceCase("test_atOrAfter_string_timestamp")(_.atOrAfter(targetTs))
  sliceCase("test_between_string_timestamp")(
    _.between("2020-08-01 00:01:10", "2020-09-01 00:18:00"))
  sliceCase("test_between_exclusive_string_timestamp")(
    _.between("2020-08-01 00:01:10", "2020-09-01 00:18:00", inclusive = false))
  sliceCase("test_earliest_string_timestamp")(_.earliest(n = 3))
  sliceCase("test_latest_string_timestamp")(_.latest(n = 3))
  sliceCase("test_priorTo_string_timestamp")(_.priorTo("2020-09-01 00:02:00"))
  sliceCase("test_subsequentTo_string_timestamp")(_.subsequentTo("2020-09-01 00:02:00"))

  test("slicing on a numeric (double epoch) ts column") {
    val t = fx.testCase("TSDFBaseTests", "test_at_numeric_timestamp")
    def dbl(x: TSDF): TSDF =
      x.copy(df = x.df.withColumn(x.tsCol, col(x.tsCol).cast("double")))
    val init = dbl(fx.tsdf(t.get("init")))
    val expected = dbl(TSDF(fx.df(t.get("expected")), "event_ts", Seq("symbol")))
    val target = java.sql.Timestamp.valueOf(targetTs).getTime / 1000.0
    assertDfEquality(init.at(target).df, expected.df)
  }

  // ------------------------------------------------------------- stats
  test("withRangeStats over a 20-minute range window") {
    val t = fx.testCase("RangeStatsTest", "test_range_stats")
    def shape(df: DataFrame, withZscore: Boolean): DataFrame = {
      val base = Seq(col("symbol"), col("event_ts"),
        col("mean_trade_pr").cast("decimal(5,2)").alias("mean_trade_pr"),
        col("count_trade_pr"),
        col("min_trade_pr").cast("decimal(5,2)").alias("min_trade_pr"),
        col("max_trade_pr").cast("decimal(5,2)").alias("max_trade_pr"),
        col("sum_trade_pr").cast("decimal(5,2)").alias("sum_trade_pr"),
        col("stddev_trade_pr").cast("decimal(5,2)").alias("stddev_trade_pr"))
      df.select(base ++ (if (withZscore)
        Seq(col("zscore_trade_pr").cast("decimal(5,2)").alias("zscore_trade_pr"))
      else Seq.empty): _*)
    }
    val actual = fx.tsdf(t.get("init")).withRangeStats(rangeBackWindowSecs = 1200).df
    assertDfEquality(shape(actual, withZscore = true),
      shape(fx.df(t.get("expected")), withZscore = true))
  }

  test("withGroupedStats per 1-minute bucket") {
    val t = fx.testCase("RangeStatsTest", "test_group_stats")
    def shape(df: DataFrame): DataFrame =
      df.select(col("symbol"), col("event_ts"),
        col("mean_trade_pr").cast("decimal(5,2)").alias("mean_trade_pr"),
        col("count_trade_pr"),
        col("min_trade_pr").cast("decimal(5,2)").alias("min_trade_pr"),
        col("max_trade_pr").cast("decimal(5,2)").alias("max_trade_pr"),
        col("sum_trade_pr").cast("decimal(5,2)").alias("sum_trade_pr"),
        col("stddev_trade_pr").cast("decimal(5,2)").alias("stddev_trade_pr"))
    val actual = fx.tsdf(t.get("init")).withGroupedStats(freq = "1 min").df
    assertDfEquality(shape(actual), shape(fx.df(t.get("expected"))))
  }

  // ----------------------------------------------------------- resample
  test("resample floor with prefix, 5-minute mean, and calc_bars") {
    val t = fx.testCase("ResampleTest", "test_resample")
    val in = fx.tsdf(t.get("input"))
    assertDfEquality(
      in.resample("min", "floor", prefix = Some("floor")).df,
      fx.df(t.get("expected")))
    assertDfEquality(
      in.resample("5 minutes", "mean").df
        .withColumn("trade_pr", round(col("trade_pr"), 2)),
      fx.df(t.get("expected30m")))
    assertDfEquality(
      in.calcBars("min", Seq("trade_pr", "trade_pr_2")).df,
      fx.df(t.get("expectedbars")))
  }

  test("resample to millisecond buckets") {
    val t = fx.testCase("ResampleTest", "test_resample_millis")
    assertDfEquality(
      fx.tsdf(t.get("init")).resample("ms", "mean").df
        .withColumn("trade_pr", round(col("trade_pr"), 2)),
      fx.df(t.get("expectedms")))
  }

  test("upsample with fill") {
    val t = fx.testCase("ResampleTest", "test_upsample")
    val in = fx.tsdf(t.get("input"))
    val resampled = in.resample("5 minutes", "mean", fill = true).df
      .withColumn("trade_pr", round(col("trade_pr"), 2))
    val upsampled = resampled.filter(col("event_ts").isin(
      "2020-08-01 00:00:00", "2020-08-01 00:05:00",
      "2020-09-01 00:00:00", "2020-09-01 00:15:00"))
    assertDfEquality(upsampled, fx.df(t.get("expected30m")))
    assertDfEquality(in.calcBars("min", Seq("trade_pr", "trade_pr_2")).df,
      fx.df(t.get("expectedbars")))
  }

  // ----------------------------------------------------- state intervals
  private def stateCase(name: String, op: Either[String, (Column, Column) => Column]): Unit =
    test(s"extractStateIntervals: $name") {
      val t = fx.testCase("ExtractStateIntervalsTest", name)
      assertDfEquality(
        fx.tsdf(t.get("input"))
          .extractStateIntervals(Seq("metric_1", "metric_2", "metric_3"), op),
        fx.df(t.get("expected")))
    }

  stateCase("test_eq_0", Left("="))
  stateCase("test_eq_1", Left("=="))
  stateCase("test_ne_0", Left("!="))
  stateCase("test_ne_1", Left("<>"))
  stateCase("test_gt_0", Left(">"))
  stateCase("test_lt_0", Left("<"))
  stateCase("test_gte_0", Left(">="))
  stateCase("test_lte_0", Left("<="))
  stateCase("test_null_safe_eq_0", Left("<=>"))
  stateCase("test_adjacent_intervals", Left("="))
  stateCase("test_threshold_fn", Right((a, b) => abs(a - b) < lit(0.5)))

  test("extractStateIntervals rejects invalid operators") {
    val t = fx.testCase("ExtractStateIntervalsTest", "test_invalid_state_definition_str")
    intercept[IllegalArgumentException] {
      fx.tsdf(t.get("input"))
        .extractStateIntervals(Seq("metric_1", "metric_2", "metric_3"), Left("N/A"))
    }
  }

  test("showSlice returns the k most recent rows per series, globally ordered") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val rows = Seq(
      ("u1", ts("2024-01-01 00:00:00"), 1.0), ("u1", ts("2024-01-01 00:01:00"), 2.0),
      ("u1", ts("2024-01-01 00:02:00"), 3.0), ("u2", ts("2024-01-01 00:00:30"), 4.0))
    val sliced = TSDF(rows.toDF("user_id", "ts", "value"), "ts", Seq("user_id"))
      .showSlice(k = 2).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2))).toSeq
    assert(sliced == Seq(
      ("u1", ts("2024-01-01 00:01:00"), 2.0), ("u1", ts("2024-01-01 00:02:00"), 3.0),
      ("u2", ts("2024-01-01 00:00:30"), 4.0)))
  }

  test("TSDF.of rejects a malformed ts string anywhere in the data") {
    val spark2 = spark
    import spark2.implicits._
    val good = Seq(("a", "2024-01-01 00:00:00"), ("a", "2024-01-01 00:00:01"))
    assert(TSDF.of(good.toDF("k", "ts"), "ts", Seq("k")).df.count() == 2)
    // the first row samples valid, the bad row hides later in the data
    val bad = good :+ (("a", "not-a-timestamp"))
    val e = intercept[IllegalArgumentException] {
      TSDF.of(bad.toDF("k", "ts"), "ts", Seq("k"))
    }
    assert(e.getMessage.contains("fail to parse"), e.getMessage)
  }

  test("TSDF.of validate modes: sample/off skip the full scan, full catches") {
    val spark2 = spark
    import spark2.implicits._
    val good = Seq(("a", "2024-01-01 00:00:00"), ("a", "2024-01-01 00:00:01"))
    val bad = good :+ (("a", "not-a-timestamp"))
    // sample: first row passes the format check; the hidden bad row parses
    // to a null timestamp downstream instead of failing construction
    val tSample = TSDF.of(bad.toDF("k", "ts"), "ts", Seq("k"), validate = "sample")
    assert(tSample.df.count() == 3)
    // off: constructs even when the FIRST row is malformed — zero jobs
    val tOff = TSDF.of(Seq(("a", "nope")).toDF("k", "ts"), "ts", Seq("k"),
      validate = "off")
    assert(tOff.df.count() == 1)
    // sample still rejects a malformed first row
    intercept[IllegalArgumentException] {
      TSDF.of(Seq(("a", "nope")).toDF("k", "ts"), "ts", Seq("k"),
        validate = "sample")
    }
    // explicit full rejects the hidden bad row (auto does too on small data
    // — the previous test exercises the auto default)
    intercept[IllegalArgumentException] {
      TSDF.of(bad.toDF("k", "ts"), "ts", Seq("k"), validate = "full")
    }
    intercept[IllegalArgumentException] {
      TSDF.of(good.toDF("k", "ts"), "ts", Seq("k"), validate = "bogus")
    }
  }

  test("withPartitionCols rebinds the series and revalidates columns") {
    import spark.implicits._
    import java.sql.Timestamp
    val df = Seq(("u1", "s1", Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
      .toDF("user_id", "sym", "ts", "value")
    val t = TSDF(df, "ts", Seq("user_id"))
    val rebound = t.withPartitionCols(Seq("sym"))
    assert(rebound.partitionCols == Seq("sym"))
    assert(rebound.latest(1).df.count() == 1)
  }

  // ------------------------------------------------------------ fourier
  private def fourierCase(name: String): Unit = test(s"fourier: $name") {
    val t = fx.testCase("FourierTransformTest", name)
    assertDfEquality(
      fx.tsdf(t.get("init")).fourierTransform(1.0, "val").df,
      fx.df(t.get("expected")))
  }

  fourierCase("test_fourier_transform")
  fourierCase("test_fourier_transform_no_sequence_col_empty_partition_cols")
  fourierCase("test_fourier_transform_valid_sequence_col_empty_partition_cols")
  fourierCase("test_fourier_transform_valid_sequence_col_valid_partition_cols")
}
