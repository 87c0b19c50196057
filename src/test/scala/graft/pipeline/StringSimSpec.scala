package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StringSimSpec extends SparkTestBase {

  /** Independent reference: the standard greedy-window algorithm in plain
    * Scala (mutable, index-based) — the Column fold must reproduce every
    * component exactly. Returns (m, t2, prefix, jw). */
  private def jwRef(a: String, b: String): (Long, Long, Long, Double) = {
    val la = a.length; val lb = b.length
    val prefix = if (la == 0 || lb == 0) 0L
      else (0 until math.min(4, math.min(la, lb)))
        .takeWhile(k => a(k) == b(k)).length.toLong
    if (la == 0 && lb == 0) return (0L, 0L, 0L, 1.0)
    if (la == 0 || lb == 0) return (0L, 0L, prefix, 0.0)
    val w = math.max(0, math.max(la, lb) / 2 - 1)
    val used = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (i <- 0 until la) {
      val jlo = math.max(0, i - w); val jhi = math.min(lb - 1, i + w)
      var found = -1
      var j = jlo
      while (j <= jhi && found < 0) {
        if (!used.contains(j) && b(j) == a(i)) found = j
        j += 1
      }
      if (found >= 0) used += found
    }
    val m = used.length
    if (m == 0) return (0L, 0L, prefix, 0.0)
    val aP = used.map(b(_))
    val bP = used.sorted.map(b(_))
    val t2 = aP.zip(bP).count { case (x, y) => x != y }.toLong
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (2.0 * m - t2) / (2.0 * m)) / 3.0
    (m.toLong, t2, prefix, jaro + prefix * 0.1 * (1.0 - jaro))
  }

  private def run(pairs: Seq[(String, String)]): Seq[(Long, Long, Long, Double)] = {
    import spark.implicits._
    StringSim.jaroWinkler(pairs.toDF("a", "b"), col("a"), col("b"))
      .select(col("m"), col("t2"), col("prefix"), col("jw"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
  }

  test("jaroWinkler reproduces the classic published values") {
    val got = run(Seq(
      ("martha", "marhta"),   // one transposition, prefix 3
      ("dixon", "dicksonx"),  // unequal lengths, prefix 2
      ("", ""), ("abc", ""), ("same", "same")))
    assert(got(0)._4 == 0.9611111111111111, got(0).toString)
    assert(got(0)._1 == 6L && got(0)._2 == 2L && got(0)._3 == 3L)
    assert(math.abs(got(1)._4 - 0.8133333333333332) < 1e-15, got(1).toString)
    assert(got(2)._4 == 1.0)
    assert(got(3)._4 == 0.0)
    assert(got(4)._4 == 1.0)
  }

  test("property: the Column fold equals the reference algorithm on " +
      "random small-alphabet strings (all components, bit-exact jw)") {
    val rnd = new scala.util.Random(89)
    def word() = Seq.fill(rnd.nextInt(13))("abc".charAt(rnd.nextInt(3))).mkString
    val pairs = (0 until 120).map(_ => (word(), word()))
    val got = run(pairs)
    pairs.zip(got).foreach { case ((a, b), g) =>
      val want = jwRef(a, b)
      assert(g == want, s"'$a' vs '$b': got $g want $want")
    }
  }
}
