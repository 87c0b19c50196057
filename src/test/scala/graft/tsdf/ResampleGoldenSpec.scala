package graft.tsdf

import graft.{GoldenFixtures, SparkTestBase}

/** Golden tests ported from the reference resample suite
  * (/root/reference/python/tests/resample_tests.py:40-130, fixtures
  * resample_tests.json). */
class ResampleGoldenSpec extends SparkTestBase {

  private lazy val fx = new GoldenFixtures(spark, "resample_tests.json")
  private def tc(name: String) = fx.testCase("ResampleUnitTests", name)

  test("aggregate floor (argmin-by-ts struct idiom)") {
    val t = tc("test_aggregate_floor")
    assertDfEquality(
      Resample.aggregate(fx.tsdf(t.get("init")), "1 DAY", "floor").df,
      fx.df(t.get("expected")))
  }

  test("aggregate mean with explicit metric cols") {
    val t = tc("test_aggregate_average")
    assertDfEquality(
      Resample.aggregate(fx.tsdf(t.get("init")), "1 DAY", "mean",
        metricCols = Some(Seq("trade_pr", "trade_pr_2"))).df,
      fx.df(t.get("expected")))
  }

  test("aggregate min (includes non-numeric orderables)") {
    val t = tc("test_aggregate_min")
    assertDfEquality(
      Resample.aggregate(fx.tsdf(t.get("init")), "1 DAY", "min").df,
      fx.df(t.get("expected")))
  }

  test("aggregate min with prefix") {
    val t = tc("test_aggregate_min_with_prefix")
    assertDfEquality(
      Resample.aggregate(fx.tsdf(t.get("init")), "1 DAY", "min",
        prefix = Some("min")).df,
      fx.df(t.get("expected")))
  }

  test("aggregate min with fill") {
    val t = tc("test_aggregate_min_with_fill")
    assertDfEquality(
      Resample.aggregate(fx.tsdf(t.get("init")), "1 DAY", "min", fill = true).df,
      fx.df(t.get("expected")))
  }

  test("aggregate max") {
    val t = tc("test_aggregate_max")
    assertDfEquality(
      Resample.aggregate(fx.tsdf(t.get("init")), "1 DAY", "max").df,
      fx.df(t.get("expected")))
  }

  test("aggregate ceil (argmax-by-ts struct idiom)") {
    val t = tc("test_aggregate_ceiling")
    assertDfEquality(
      Resample.aggregate(fx.tsdf(t.get("init")), "1 DAY", "ceil").df,
      fx.df(t.get("expected")))
  }

  test("invalid func and freq are rejected") {
    val t = tc("test_aggregate_floor")
    val in = fx.tsdf(t.get("init"))
    intercept[IllegalArgumentException] {
      Resample.aggregate(in, "1 DAY", "average")
    }
    intercept[IllegalArgumentException] { Resample.parseFreq("1 fortnight") }
    intercept[IllegalArgumentException] { Resample.parseFreq("") }
  }

  test("freq parsing accepts all documented unit spellings") {
    assert(Resample.parseFreq("1 us").micros == 1L)
    assert(Resample.parseFreq("1 ms").micros == 1000L)
    assert(Resample.parseFreq("30 sec").micros == 30000000L)
    assert(Resample.parseFreq("5 min").micros == 300000000L)
    assert(Resample.parseFreq("1 hr").micros == 3600000000L)
    assert(Resample.parseFreq("day").micros == 86400000000L)
  }
}
