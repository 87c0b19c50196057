package graft.intervals

import java.sql.Timestamp

import graft.SparkTestBase

/** The overlap-depth router and the sweep-line fallback of
  * [[IntervalsDF.makeDisjoint]]: deep series must complete without the
  * O(n²) cover join, and the fallback must produce bit-identical results to
  * the relational path on arbitrary inputs. */
class MakeDisjointSweepSpec extends SparkTestBase {

  private def ts(us: Long) = new Timestamp(us)

  private def idf(rows: Seq[(String, Timestamp, Timestamp, java.lang.Double)]): IntervalsDF = {
    val spark2 = spark
    import spark2.implicits._
    IntervalsDF(rows.toDF("series_1", "start_ts", "end_ts", "m"),
      "start_ts", "end_ts", Seq("series_1"))
  }

  test("one series of 5k mutually-overlapping intervals completes via the sweep-line") {
    // interval i = [i, 10000 + i) — every pair overlaps, depth = 5000; the
    // relational path would join ~10k segments x 5k covering intervals
    val n = 5000
    val rows = (0 until n).map(i =>
      ("s", ts(i.toLong * 1000), ts((10000L + i) * 1000), Double.box(i.toDouble)))
    val t0 = System.nanoTime()
    val out = idf(rows).makeDisjoint().df.collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60, s"sweep-line fallback took $secs s")
    // disjoint cover: the latest-start interval wins each segment and runs
    // of equal winners coalesce — the winner changes at every interval start
    // and everything from the last start onward is one run, so n rows
    assert(out.length == n, s"expected $n rows, got ${out.length}")
    val byStart = out.sortBy(_.getTimestamp(1).getTime)
    // each segment's winner is the covering interval with the largest start
    byStart.zipWithIndex.foreach { case (r, i) =>
      val expected = math.min(i, n - 1).toDouble
      assert(r.getDouble(3) == expected, s"row $i: $r")
    }
  }

  test("sweep-line path equals relational path on random interval sets") {
    val rnd = new scala.util.Random(1234)
    (0 until 25).foreach { trial =>
      val rows = (0 until 40).map { _ =>
        val series = "abc".charAt(rnd.nextInt(3)).toString
        val start = rnd.nextInt(50).toLong
        val len = rnd.nextInt(31).toLong // zero-length intervals included
        val value =
          if (rnd.nextInt(5) == 0) null else Double.box(rnd.nextInt(6).toDouble)
        (series, ts(start * 1000000L), ts((start + len) * 1000000L), value)
      }
      val in = idf(rows)
      // threshold 0 routes every series through the sweep-line;
      // Int.MaxValue keeps every series on the relational join
      withClue(s"trial $trial: ") {
        assertDfEquality(in.makeDisjoint(depthThreshold = 0).df,
          in.makeDisjoint(depthThreshold = Int.MaxValue).df)
      }
    }
  }

  test("property: relational/sweep equality pinned AT DefaultDepthThreshold " +
      "with mixed-type/null metrics") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val spark2 = spark
    import spark2.implicits._
    val thr = IntervalsDF.DefaultDepthThreshold
    // metric generators: nullable double + nullable string (mixed types)
    val md = Gen.option(Gen.choose(0, 5).map(_.toDouble))
    val ms = Gen.option(Gen.oneOf("a", "b", "c"))
    val metricsGen = Gen.listOfN(3 * (thr + 1) + 20, Gen.zip(md, ms))
    val prop = Prop.forAll(metricsGen) { metrics =>
      // three staircase series with max overlap depth EXACTLY thr−1, thr,
      // thr+1 (interval i = [i, k+i) ⇒ depth k at t = k−1): the router
      // must keep "below"/"at" relational and send "above" to the
      // sweep-line, and all three paths must agree bit-for-bit whatever
      // the metric values/null patterns are
      val it = metrics.iterator
      def staircase(name: String, k: Int) = (0 until k).map { i =>
        val (m1, m2) = it.next()
        (name, ts(i.toLong * 1000000L), ts((k + i).toLong * 1000000L),
          m1.map(Double.box).orNull, m2.orNull)
      }
      val rows = staircase("below", thr - 1) ++ staircase("at", thr) ++
        staircase("above", thr + 1) ++ staircase("shallow", 20)
      val df = rows.toDF("series_1", "start_ts", "end_ts", "m1", "m2")
      val in = IntervalsDF(df, "start_ts", "end_ts", Seq("series_1"))
      val routed = in.makeDisjoint().df
      val allSweep = in.makeDisjoint(depthThreshold = 0).df
      val allRelational = in.makeDisjoint(depthThreshold = Int.MaxValue).df
      assertDfEquality(routed, allSweep)
      assertDfEquality(routed, allRelational)
      true
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("depth router keeps shallow series on the relational path (no flatMapGroups)") {
    val rows = Seq(
      ("s", ts(0L), ts(2000000L), Double.box(1.0)),
      ("s", ts(1000000L), ts(3000000L), Double.box(2.0)))
    val plan = idf(rows).makeDisjoint().df.queryExecution.executedPlan.toString
    // the sweep-line side of the union must prune to empty only at runtime,
    // but the shallow side must keep the segment x cover equi-join
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"), plan)
    // [1,2) and [2,3) merge to the same value and coalesce into [1,3)
    val out = idf(rows).makeDisjoint().df.orderBy("start_ts").collect()
    assert(out.map(_.getDouble(3)).toSeq == Seq(1.0, 2.0))
  }
}
