package graft.tsdf

import org.apache.spark.sql.functions._

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

  test("nearest as-of equals brute force; backward wins ties; tolerance nulls") {
    import spark.implicits._
    val rnd = new scala.util.Random(91)
    def mk(n: Int) = (0 until n).map { i =>
      (rnd.nextInt(3).toLong, rnd.nextInt(10000).toLong, i.toLong)
    }
    val lRows = mk(300)
    val rRows = mk(120)
    def toTsdf(rows: Seq[(Long, Long, Long)], vName: String) = graft.tsdf.TSDF(
      rows.toDF("sid", "sec", vName)
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec"),
      "ts", Seq("sid"))
    val got = toTsdf(lRows, "lv").asofJoinNearest(toTsdf(rRows, "rv"))
      .df.select(col("sid"), unix_micros(col("ts")), col("lv"),
        unix_micros(col("right_ts")), col("right_rv"))
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSet
    val expected = lRows.map { case (sid, sec, lv) =>
      val cands = rRows.filter(_._1 == sid)
      if (cands.isEmpty) (sid, sec * 1000000L, lv, None, None)
      else {
        // min |dist|; ties prefer backward (r.sec <= l.sec); among equal
        // (dist, direction) the input has unique (sid, sec) pairs? not
        // guaranteed -> restrict generator check below
        val best = cands.minBy { case (_, rs, _) =>
          (math.abs(rs - sec), if (rs <= sec) 0 else 1)
        }
        (sid, sec * 1000000L, lv, Some(best._2 * 1000000L), Some(best._3))
      }
    }.toSet
    // duplicate right (sid, sec) keys make the pick ambiguous on the value
    // column; the generator avoids them for the differential to be exact
    val dupRight = rRows.groupBy(r => (r._1, r._2)).exists(_._2.size > 1)
    assume(!dupRight, "generator produced duplicate right keys; reseed")
    assert(got == expected)
    // tolerance: a 1-second band nulls everything farther than 1 s
    val tol = toTsdf(lRows, "lv").asofJoinNearest(toTsdf(rRows, "rv"),
      tolerance = Some(1.0))
      .df.select(col("sid"), unix_micros(col("ts")), unix_micros(col("right_ts")))
      .as[(Long, Long, Option[Long])].collect()
    tol.foreach { case (_, lus, rus) =>
      rus.foreach(r => assert(math.abs(lus - r) <= 1000000L))
    }
    // exact-ts match: distance 0, backward branch -> the row itself
    val l1 = toTsdf(Seq((7L, 100L, 1L)), "lv")
    val r1 = toTsdf(Seq((7L, 100L, 42L), (7L, 101L, 43L)), "rv")
    val hit = l1.asofJoinNearest(r1).df
      .select(col("right_rv")).as[Long].collect()
    assert(hit.toSeq == Seq(42L))
  }
}
