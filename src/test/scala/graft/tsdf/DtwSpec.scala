package graft.tsdf

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DtwSpec extends SparkTestBase {

  /** Reference DP: the textbook O(n·m) table, no tricks — the fold must
    * match this exactly on every input. */
  private def dtwRef(a: Seq[Long], b: Seq[Long]): Long = {
    val inf = Dtw.Inf
    val dp = Array.fill(a.length + 1, b.length + 1)(inf)
    dp(0)(0) = 0L
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
        math.min(dp(i - 1)(j), math.min(dp(i - 1)(j - 1), dp(i)(j - 1)))
    dp(a.length)(b.length)
  }

  test("dtwDistance matches hand cases: elasticity scores a shifted spike 0") {
    import spark.implicits._
    val cases = Seq(
      (Seq(1L, 3L, 4L), Seq(1L, 2L, 4L), 1L),     // one unit of warp cost
      (Seq(0L, 0L, 5L, 0L), Seq(0L, 5L, 0L, 0L), 0L), // shift absorbed
      (Seq(2L, 2L, 2L), Seq(2L, 2L, 2L), 0L),     // identical
      (Seq(7L), Seq(1L, 2L, 3L), 15L))            // 1-vs-many alignment
    val got = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(Dtw.dtwDistance(col("a"), col("b")).alias("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map(_._3), s"got $got")
  }

  test("property: the nested-HOF fold equals the textbook DP on random " +
      "signed profiles, including unequal lengths") {
    import spark.implicits._
    val rnd = new scala.util.Random(73)
    val cases = (0 until 40).map { _ =>
      val n = 1 + rnd.nextInt(12)
      val m = 1 + rnd.nextInt(12)
      (Seq.fill(n)(rnd.nextInt(2001).toLong - 1000),
        Seq.fill(m)(rnd.nextInt(2001).toLong - 1000))
    }
    val got = cases.toDF("a", "b")
      .select(Dtw.dtwDistance(col("a"), col("b")).alias("d"))
      .collect().map(_.getLong(0)).toSeq
    val want = cases.map { case (a, b) => dtwRef(a, b) }
    assert(got == want)
  }

  test("hourOfDayProfiles builds exact 24-slot integer profiles with " +
      "empty hours zero-filled") {
    import spark.implicits._
    val rows = Seq(
      ("u1", Timestamp.valueOf("2024-03-01 01:10:00"), 5L),
      ("u1", Timestamp.valueOf("2024-03-02 01:50:00"), 7L), // same hour-of-day
      ("u1", Timestamp.valueOf("2024-03-01 23:00:00"), 2L),
      ("u2", Timestamp.valueOf("2024-03-01 00:00:00"), 9L))
      .toDF("user_id", "ts", "v")
    val prof = Dtw.hourOfDayProfiles(rows, "user_id", col("ts"), col("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val u1 = Seq.tabulate(24)(h => if (h == 1) 12L else if (h == 23) 2L else 0L)
    val u2 = Seq.tabulate(24)(h => if (h == 0) 9L else 0L)
    assert(prof("u1") == u1)
    assert(prof("u2") == u2)
  }
}
