package graft.intervals

import org.apache.spark.sql.functions._

import graft.{GoldenFixtures, SparkTestBase}

/** Golden tests ported from the reference intervals suite
  * (/root/reference/python/tests/intervals_tests.py:30-414, fixtures
  * intervals_tests.json), including the issue-268 regression. */
class IntervalsGoldenSpec extends SparkTestBase {

  private lazy val fx = new GoldenFixtures(spark, "intervals_tests.json")
  private def tc(name: String) = fx.testCase("IntervalsDFTests", name)

  private def disjointCase(name: String): Unit = test(s"make_disjoint: $name") {
    val t = tc(name)
    val in = fx.idf(t.get("init"))
    val expected = fx.idf(t.get("expected"))
    assertDfEquality(in.makeDisjoint().df, expected.df)
  }

  disjointCase("test_make_disjoint")
  disjointCase("test_make_disjoint_contains_interval_already_disjoint")
  disjointCase("test_make_disjoint_contains_intervals_equal")
  disjointCase("test_make_disjoint_intervals_same_start")
  disjointCase("test_make_disjoint_intervals_same_end")
  disjointCase("test_make_disjoint_multiple_series")
  disjointCase("test_make_disjoint_single_metric")
  disjointCase("test_make_disjoint_interval_is_subset")
  disjointCase("test_make_disjoint_issue_268")

  test("fromStackedMetrics (discovered metric names)") {
    val t = tc("test_fromStackedMetrics_series_list")
    val in = fx.df(t.get("init"))
      .withColumn("start_ts", to_timestamp(col("start_ts")))
      .withColumn("end_ts", to_timestamp(col("end_ts")))
    val out = IntervalsDF.fromStackedMetrics(in, "start_ts", "end_ts",
      Seq("series_1"), "metric_name", "metric_value")
    assertDfEquality(out.df, fx.idf(t.get("expected")).df)
  }

  test("fromStackedMetrics (explicit metric names, no discovery job)") {
    val t = tc("test_fromStackedMetrics_metric_names")
    val in = fx.df(t.get("init"))
      .withColumn("start_ts", to_timestamp(col("start_ts")))
      .withColumn("end_ts", to_timestamp(col("end_ts")))
    val out = IntervalsDF.fromStackedMetrics(in, "start_ts", "end_ts",
      Seq("series_1"), "metric_name", "metric_value",
      metricNames = Seq("metric_1", "metric_2"))
    assertDfEquality(out.df, fx.idf(t.get("expected")).df)
  }

  test("makeDisjoint with empty seriesIds stays an equi-join and is correct") {
    import java.sql.Timestamp
    val spark2 = spark
    import spark2.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val in = IntervalsDF(Seq(
      (ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00"), 1.0),
      (ts("2024-01-01 01:00:00"), ts("2024-01-01 03:00:00"), 2.0))
      .toDF("start_ts", "end_ts", "m"), "start_ts", "end_ts", Seq.empty)
    val out = in.makeDisjoint()
    val p = out.df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(out.df.columns.toSeq == Seq("start_ts", "end_ts", "m"))
    val rows = out.df.orderBy("start_ts").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      (ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"), 1.0),
      (ts("2024-01-01 01:00:00"), ts("2024-01-01 03:00:00"), 2.0)))
  }

  test("overlapJoin equals the theta join, emits each pair once") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    def mk(n: Int, tag: String) = (0 until n).map { i =>
      val s = rnd.nextInt(100000)
      (rnd.nextInt(3).toLong, s"$tag$i",
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)),
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s + 1 + rnd.nextInt(20000))))
    }.toDF("sid", "tag", "start_ts", "end_ts")
    val a = mk(80, "a"); val b = mk(80, "b")
    val got = IntervalsDF(a, "start_ts", "end_ts", Seq("sid"))
      .overlapJoin(IntervalsDF(b, "start_ts", "end_ts", Seq("sid")),
        binSeconds = 3600L)
      .select("sid", "tag", "right_tag").as[(Long, String, String)]
      .collect().toSeq
    // each true pair appears exactly once
    assert(got.size == got.toSet.size, "duplicate pair emitted")
    val expected = a.alias("l").join(b.alias("r"),
      col("l.sid") === col("r.sid") &&
        col("l.start_ts") < col("r.end_ts") &&
        col("r.start_ts") < col("l.end_ts"))
      .select(col("l.sid"), col("l.tag"), col("r.tag"))
      .as[(Long, String, String)].collect().toSet
    assert(got.toSet == expected)
    assert(expected.nonEmpty)
    // half-open: touching intervals do not pair
    val t1 = Seq((1L, "x", ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")))
      .toDF("sid", "tag", "start_ts", "end_ts")
    val t2 = Seq((1L, "y", ts("2024-01-01 01:00:00"), ts("2024-01-01 02:00:00")))
      .toDF("sid", "tag", "start_ts", "end_ts")
    assert(IntervalsDF(t1, "start_ts", "end_ts", Seq("sid"))
      .overlapJoin(IntervalsDF(t2, "start_ts", "end_ts", Seq("sid"))).count() == 0)
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("overlapJoin long-interval hybrid: month-long outliers neither explode nor get lost") {
    import spark.implicits._
    val rnd = new scala.util.Random(33)
    def shortRows(tag: String, n: Int) = (0 until n).map { i =>
      val s = rnd.nextInt(200000)
      (1L, s"$tag$i",
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)),
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s + 1 + rnd.nextInt(5000))))
    }
    val month = 30L * 24 * 3600 // 720 one-hour bins, far past the 24-bin cap
    def long(tag: String) = (1L, tag,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0)),
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(month)))
    val a = (shortRows("a", 40) :+ long("aLONG")).toDF("sid", "tag", "start_ts", "end_ts")
    val b = (shortRows("b", 40) :+ long("bLONG")).toDF("sid", "tag", "start_ts", "end_ts")
    val ivA = IntervalsDF(a, "start_ts", "end_ts", Seq("sid"))
    val ivB = IntervalsDF(b, "start_ts", "end_ts", Seq("sid"))
    val got = ivA.overlapJoin(ivB, binSeconds = 3600L, maxBinsPerInterval = 24L)
      .select("sid", "tag", "right_tag").as[(Long, String, String)].collect().toSeq
    assert(got.size == got.toSet.size, "duplicate pair emitted")
    val expected = a.alias("l").join(b.alias("r"),
      col("l.sid") === col("r.sid") &&
        col("l.start_ts") < col("r.end_ts") &&
        col("r.start_ts") < col("l.end_ts"))
      .select(col("l.sid"), col("l.tag"), col("r.tag"))
      .as[(Long, String, String)].collect().toSet
    assert(got.toSet == expected)
    // both long sides pair with everything in range, including each other
    assert(got.toSet.contains((1L, "aLONG", "bLONG")))
    // raising the cap so everything explodes must not change the answer
    val allShort = ivA.overlapJoin(ivB, binSeconds = 3600L,
        maxBinsPerInterval = 1000000L)
      .select("sid", "tag", "right_tag").as[(Long, String, String)].collect()
    assert(allShort.toSet == expected && allShort.length == allShort.toSet.size)
  }

  test("pointJoin equals the theta containment join, incl. long intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(55)
    val iv = ((0 until 60).map { i =>
      val s = rnd.nextInt(200000)
      (rnd.nextInt(3).toLong, s"iv$i",
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)),
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s + 1 + rnd.nextInt(20000))))
    } :+ ((1L, "ivLONG",
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0)),
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(30L * 24 * 3600)))))
      .toDF("sid", "ivtag", "start_ts", "end_ts")
    val pts = (0 until 200).map { i =>
      (rnd.nextInt(3).toLong, i.toLong,
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(rnd.nextInt(250000))))
    }.toDF("sid", "pid", "ts")
    val got = IntervalsDF(iv, "start_ts", "end_ts", Seq("sid"))
      .pointJoin(pts, "ts", binSeconds = 3600L, maxBinsPerInterval = 24L)
      .select("sid", "pid", "interval_ivtag").as[(Long, Long, String)]
      .collect().toSeq
    assert(got.size == got.toSet.size, "duplicate pair emitted")
    val expected = pts.alias("p").join(iv.alias("i"),
      col("p.sid") === col("i.sid") &&
        col("i.start_ts") <= col("p.ts") && col("p.ts") < col("i.end_ts"))
      .select(col("p.sid"), col("p.pid"), col("i.ivtag"))
      .as[(Long, Long, String)].collect().toSet
    assert(got.toSet == expected)
    assert(expected.exists(_._3 == "ivLONG"), "long interval must contribute")
    assert(expected.exists(_._3 != "ivLONG"), "short intervals must contribute")
    // half-open: a point at end_ts is outside, at start_ts inside
    val one = Seq((1L, "e", ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")))
      .toDF("sid", "ivtag", "start_ts", "end_ts")
    val edge = Seq((1L, 1L, ts("2024-01-01 01:00:00")),
      (1L, 2L, ts("2024-01-01 00:00:00"))).toDF("sid", "pid", "ts")
    val hits = IntervalsDF(one, "start_ts", "end_ts", Seq("sid"))
      .pointJoin(edge, "ts").select("pid").as[Long].collect().toSeq
    assert(hits == Seq(2L))
  }

  test("union and unionByName double the row count") {
    val t = tc("test_union_other_idf")
    val a = fx.idf(t.get("init"))
    val b = fx.idf(t.get("init"))
    assert(a.union(b).df.count() == a.df.count() + b.df.count())
    assert(a.unionByName(b).df.count() == a.df.count() + b.df.count())
  }

  test("unionByName with mismatched columns fails analysis") {
    val t = tc("test_unionByName_extra_column")
    val extra = fx.idf(t.get("init_extra_col"))
    val base = fx.idf(t.get("init"))
    intercept[org.apache.spark.sql.AnalysisException] {
      extra.unionByName(base).df.collect()
    }
  }

  test("toDF returns the wrapped frame") {
    val t = tc("test_toDF")
    val in = fx.idf(t.get("init"))
    assertDfEquality(in.df, fx.df(t.get("init")))
  }

  test("toDF(stack=true) unpivots to long form") {
    val t = tc("test_toDF_stack")
    val in = fx.idf(t.get("init"))
    val expected = fx.df(t.get("expected"))
      .withColumn("start_ts", to_timestamp(col("start_ts")))
      .withColumn("end_ts", to_timestamp(col("end_ts")))
    assertDfEquality(in.toStacked(), expected)
  }
}
