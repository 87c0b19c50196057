package graft.tsdf

import graft.{GoldenFixtures, SparkTestBase}

/** Golden tests ported from the reference as-of join suite
  * (/root/reference/python/tests/as_of_join_tests.py:1-180, fixtures
  * as_of_join_tests.json). */
class AsOfJoinGoldenSpec extends SparkTestBase {

  private lazy val fx = new GoldenFixtures(spark, "as_of_join_tests.json")
  private def tc(name: String) = fx.testCase("AsOfJoinTest", name)

  test("asof join, with and without right prefix") {
    val t = tc("test_asof_join")
    val left = fx.tsdf(t.get("left"))
    val right = fx.tsdf(t.get("right"))
    assertDfEquality(
      left.asofJoin(right, leftPrefix = Some("left"), rightPrefix = "right").df,
      fx.df(t.get("expected")))
    assertDfEquality(
      left.asofJoin(right, leftPrefix = Some("left"), rightPrefix = "").df,
      fx.df(t.get("expected_no_right_prefix")))
  }

  test("asof join with skip nulls enabled and disabled") {
    val t = tc("test_asof_join_skip_nulls_disabled")
    val left = fx.tsdf(t.get("left"))
    val right = fx.tsdf(t.get("right"))
    assertDfEquality(
      left.asofJoin(right, leftPrefix = Some("left"), rightPrefix = "right").df,
      fx.df(t.get("expected_skip_nulls")))
    assertDfEquality(
      left.asofJoin(right, leftPrefix = Some("left"), rightPrefix = "right",
        skipNulls = false).df,
      fx.df(t.get("expected_skip_nulls_disabled")))
  }

  test("sequence number tie-break") {
    val t = tc("test_sequence_number_sort")
    val left = fx.tsdf(t.get("left"))
    val right = fx.tsdf(t.get("right"))
    assertDfEquality(left.asofJoin(right, rightPrefix = "right").df,
      fx.df(t.get("expected")))
  }

  test("time-partitioned (skew) asof join") {
    val t = tc("test_partitioned_asof_join")
    val left = fx.tsdf(t.get("left"))
    val right = fx.tsdf(t.get("right"))
    assertDfEquality(
      left.asofJoin(right, leftPrefix = Some("left"), rightPrefix = "right",
        tsPartitionVal = Some(10L), fraction = 0.1).df,
      fx.df(t.get("expected")))
  }

  test("nanosecond string timestamps (ctor auto-conversion)") {
    val t = tc("test_asof_join_nanos")
    val left = fx.tsdf(t.get("left"))
    val right = fx.tsdf(t.get("right"))
    assertDfEquality(
      left.asofJoin(right, leftPrefix = Some("left"), rightPrefix = "right").df,
      fx.df(t.get("expected")))
  }

  test("tolerance band variants") {
    val t = tc("test_asof_join_tolerance")
    val left = fx.tsdf(t.get("left"))
    val right = fx.tsdf(t.get("right"))
    val variants: Seq[(String, Option[Double])] = Seq(
      "None" -> None, "0" -> Some(0.0), "5.5" -> Some(5.5),
      "7" -> Some(7.0), "10" -> Some(10.0))
    variants.foreach { case (name, tol) =>
      assertDfEquality(
        left.asofJoin(right, leftPrefix = Some("left"), rightPrefix = "right",
          tolerance = tol).df,
        fx.df(t.get(s"expected_tolerance_$name")))
    }
  }

  test("sql_join_opt broadcast path") {
    val t = tc("test_asof_join_sql_join_opt_and_bytes_threshold")
    val left = fx.tsdf(t.get("left"))
    val right = fx.tsdf(t.get("right"))
    assertDfEquality(
      left.asofJoin(right, leftPrefix = Some("left"), rightPrefix = "right",
        sqlJoinOpt = true).df,
      fx.df(t.get("expected")))
    assertDfEquality(
      left.asofJoin(right, leftPrefix = Some("left"), rightPrefix = "",
        sqlJoinOpt = true).df,
      fx.df(t.get("expected_no_right_prefix")))
  }
}
