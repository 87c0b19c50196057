package graft.tsdf

import graft.{GoldenFixtures, SparkTestBase}

/** Golden tests ported from the reference interpolation suite
  * (/root/reference/python/tests/interpol_tests.py, fixtures
  * interpol_tests.json). The reference helper takes ts/partition overrides
  * as arguments; here the TSDF carries them, so overrides become
  * withPartitionCols / constructor calls. */
class InterpolationGoldenSpec extends SparkTestBase {

  private lazy val fx = new GoldenFixtures(spark, "interpol_tests.json")
  private def unit(name: String) = fx.testCase("InterpolationUnitTest", name)
  private def integ(name: String) = fx.testCase("InterpolationIntegrationTest", name)

  private def runSimple(t: com.fasterxml.jackson.databind.JsonNode, method: String,
      freq: String = "30 seconds", show: Boolean = true) = {
    val in = fx.tsdf(t.get("simple_init"))
    in.interpolate(method, Some(freq), Some("mean"),
      Some(Seq("value_a", "value_b")), showInterpolated = show).df
  }

  test("zero fill") {
    val t = unit("test_zero_fill_interpolation")
    assertDfEquality(runSimple(t, "zero"), fx.df(t.get("expected")))
  }

  test("null fill") {
    val t = unit("test_null_fill_interpolation")
    assertDfEquality(runSimple(t, "null"), fx.df(t.get("expected")))
  }

  test("back fill") {
    val t = unit("test_back_fill_interpolation")
    assertDfEquality(runSimple(t, "bfill"), fx.df(t.get("expected")))
  }

  test("forward fill") {
    val t = unit("test_forward_fill_interpolation")
    assertDfEquality(runSimple(t, "ffill"), fx.df(t.get("expected")))
  }

  test("linear fill") {
    val t = unit("test_linear_fill_interpolation")
    assertDfEquality(runSimple(t, "linear"), fx.df(t.get("expected")))
  }

  test("abbreviated freq strings parse the same") {
    val t = unit("test_different_freq_abbreviations")
    assertDfEquality(runSimple(t, "linear", freq = "30 sec"),
      fx.df(t.get("expected")))
  }

  test("show_interpolated=false drops the flags") {
    val t = unit("test_show_interpolated")
    assertDfEquality(runSimple(t, "linear", show = false), fx.df(t.get("expected")))
  }

  test("invalid fill method rejected") {
    val t = unit("test_zero_fill_interpolation")
    val in = fx.tsdf(t.get("simple_init"))
    intercept[IllegalArgumentException] {
      in.interpolate("abcd", Some("30 seconds"), Some("mean"),
        Some(Seq("value_a")), showInterpolated = true)
    }
  }

  test("non-numeric forward fill works; linear and zero are rejected") {
    val tF = unit("test_non_numeric_forward_fill")
    val in = fx.tsdf(tF.get("non_numeric_init"))
    assertDfEquality(
      in.interpolate("ffill", Some("30 seconds"), Some("ceil")).df,
      fx.df(tF.get("expected")))
    Seq("linear", "zero").foreach { m =>
      intercept[IllegalArgumentException] {
        in.interpolate(m, Some("30 seconds"), Some("ceil"),
          Some(Seq("string_col", "timestamp_col")), showInterpolated = false)
      }
    }
  }

  test("non-numeric back fill") {
    val t = unit("test_non_numeric_back_fill")
    val in = fx.tsdf(t.get("non_numeric_init"))
    assertDfEquality(
      in.interpolate("bfill", Some("30 seconds"), Some("ceil")).df,
      fx.df(t.get("expected")))
  }

  test("integration: default TSDF params interpolate all numeric metrics") {
    val t = integ("test_interpolation_using_default_tsdf_params")
    val in = fx.tsdf(t.get("simple_init"))
    assertDfEquality(
      in.interpolate("linear", Some("30 seconds"), Some("mean")).df,
      fx.df(t.get("expected")))
  }

  test("integration: custom ts_col") {
    val t = integ("test_interpolation_using_custom_params")
    val base = fx.tsdf(t.get("simple_init"))
    val renamed = TSDF(base.df.withColumnRenamed("event_ts", "other_ts_col"),
      "other_ts_col", Seq("partition_a", "partition_b"))
    assertDfEquality(
      renamed.interpolate("linear", Some("30 seconds"), Some("mean"),
        Some(Seq("value_a")), showInterpolated = true).df,
      fx.df(t.get("expected")))
  }

  test("integration: chained resample then interpolate") {
    val t = integ("test_interpolation_on_sampled_data")
    val in = fx.tsdf(t.get("simple_init"))
    assertDfEquality(
      in.resample("30 seconds", "mean")
        .interpolate("linear", targetCols = Some(Seq("value_a")),
          showInterpolated = true).df,
      fx.df(t.get("expected")))
  }

  test("integration: resampled defaults flow into interpolate") {
    val t = integ("test_defaults_with_resampled_df")
    val in = fx.tsdf(t.get("simple_init"))
    assertDfEquality(
      in.resample("30 seconds", "mean").interpolate("ffill").df,
      fx.df(t.get("expected")))
  }

  test("integration: result TSDF keeps ts/partition metadata") {
    val t = integ("test_tsdf_constructor_params_are_updated")
    val in = fx.tsdf(t.get("simple_init")).withPartitionCols(Seq("partition_b"))
    val out = in.interpolate("linear", Some("30 seconds"), Some("mean"),
      Some(Seq("value_a")), showInterpolated = true)
    assert(out.tsCol == "event_ts")
    assert(out.partitionCols == Seq("partition_b"))
  }
}
