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

  test("coverage algebra: hand-built adjacency, nesting, self-overlap") {
    import spark.implicits._
    def iv(rows: Seq[(Long, Int, Int)]) = IntervalsDF(
      rows.map { case (s, a, b) =>
        (s, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(a)),
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(b)))
      }.toDF("sid", "start_ts", "end_ts"), "start_ts", "end_ts", Seq("sid"))
    def spans(r: IntervalsDF) = r.df
      .select(col("sid"), unix_micros(col("start_ts")) / 1000000L,
        unix_micros(col("end_ts")) / 1000000L)
      .as[(Long, Double, Double)].collect().toSet
      .map((t: (Long, Double, Double)) => (t._1, t._2.toInt, t._3.toInt))
    // A covers [0,10) twice (self-overlap) + [20,30); B = [5,25)
    val a = iv(Seq((1L, 0, 10), (1L, 2, 10), (1L, 20, 30)))
    val b = iv(Seq((1L, 5, 25)))
    assert(spans(a.intersectCoverage(b)) == Set((1L, 5, 10), (1L, 20, 25)))
    assert(spans(a.subtractCoverage(b)) == Set((1L, 0, 5), (1L, 25, 30)))
    // adjacency coalesces: A = [0,5)+[5,10) minus nothing = one interval
    val adj = iv(Seq((2L, 0, 5), (2L, 5, 10)))
    val none = iv(Seq.empty[(Long, Int, Int)])
    assert(spans(adj.subtractCoverage(none)) == Set((2L, 0, 10)))
    // nesting: B strictly inside A splits A in two
    val outer = iv(Seq((3L, 0, 100)))
    val inner = iv(Seq((3L, 40, 60)))
    assert(spans(outer.subtractCoverage(inner)) ==
      Set((3L, 0, 40), (3L, 60, 100)))
    assert(spans(outer.intersectCoverage(inner)) == Set((3L, 40, 60)))
    // B covering A entirely -> empty subtraction; disjoint -> empty intersect
    assert(inner.subtractCoverage(outer).df.count() == 0)
    assert(iv(Seq((4L, 0, 5))).intersectCoverage(iv(Seq((4L, 6, 9))))
      .df.count() == 0)
    // half-open: touching intervals do not intersect
    assert(iv(Seq((5L, 0, 5))).intersectCoverage(iv(Seq((5L, 5, 9))))
      .df.count() == 0)
  }

  test("coverage algebra differential vs brute-force second-by-second sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(33)
    def mk(n: Int) = (0 until n).map { _ =>
      val s = rnd.nextInt(500)
      (rnd.nextInt(2).toLong, s, s + 1 + rnd.nextInt(80))
    }
    val ar = mk(40); val br = mk(40)
    def toDfIv(rows: Seq[(Long, Int, Int)]) = IntervalsDF(
      rows.map { case (s, a, b) =>
        (s, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(a)),
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(b)))
      }.toDF("sid", "start_ts", "end_ts"), "start_ts", "end_ts", Seq("sid"))
    def cover(rows: Seq[(Long, Int, Int)], sid: Long): Set[Int] =
      rows.filter(_._1 == sid).flatMap(r => r._2 until r._3).toSet
    def gotSet(r: IntervalsDF, sid: Long): Set[Int] = r.df
      .filter(col("sid") === sid)
      .select(unix_micros(col("start_ts")), unix_micros(col("end_ts")))
      .as[(Long, Long)].collect()
      .flatMap { case (s, e) => (s / 1000000L).toInt until (e / 1000000L).toInt }
      .toSet
    val a = toDfIv(ar); val b = toDfIv(br)
    val inter = a.intersectCoverage(b)
    val sub = a.subtractCoverage(b)
    Seq(0L, 1L).foreach { sid =>
      val ca = cover(ar, sid); val cb = cover(br, sid)
      assert(gotSet(inter, sid) == (ca intersect cb), s"intersect sid=$sid")
      assert(gotSet(sub, sid) == (ca diff cb), s"subtract sid=$sid")
    }
    // results are disjoint and coalesced: no two output intervals touch
    Seq(inter, sub).foreach { r =>
      val rows = r.df.select(col("sid"), unix_micros(col("start_ts")),
        unix_micros(col("end_ts"))).as[(Long, Long, Long)].collect()
        .groupBy(_._1).values
      rows.foreach { ivs =>
        val sorted = ivs.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Array((_, _, e1), (_, s2, _)) => assert(e1 < s2)
          case _ =>
        }
      }
    }
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
