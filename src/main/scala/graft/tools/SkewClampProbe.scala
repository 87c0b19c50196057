package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale gate for the media near-dup oversized-bucket clamp: builds the
  * low-entropy distinct-hash shape — n DISTINCT 64-bit unit hashes all
  * agreeing on band 0 (the dark-keyframe / silence-segment corpus, many
  * DISTINCT hashes sharing one 16-bit band value) — and measures the
  * verified-pair stage [[graft.pipeline.Multimodal
  * .bandedDistinctHashPairs]] at maxHamming = 64 (every candidate
  * passes verification, so the output count IS the candidate emission):
  *
  *  - unclamped (c = Int.MaxValue) at doubling n: emission is exactly
  *    n(n-1)/2 — the ~n²/2¹⁶-per-band blowup the r16 verdict flagged;
  *  - clamped at the same / much larger n: emission bounded near n·c.
  *
  * Usage: SkewClampProbe [n:c ...]   (c = 0 → unclamped)
  * Default runs: 20000:0 40000:0 40000:4096 640000:512 */
object SkewClampProbe {
  def main(args: Array[String]): Unit = {
    val runs = (if (args.nonEmpty) args.toSeq
      else Seq("20000:0", "40000:0", "40000:4096", "640000:512"))
      .map { s => val p = s.split(":"); (p(0).toLong, p(1).toInt) }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def dsigOf(n: Long): DataFrame = spark.range(n).select(
      ((col("id") * 2654435761L) % 4294967296L).alias("__hi"),
      (shiftleft((col("id") * 40503L) % 65536L, 16) + 0x1234L)
        .alias("__lo"))
      .repartition(32)
    runs.foreach { case (n, c) =>
      val clamp = if (c <= 0) Int.MaxValue else c
      val t0 = System.nanoTime()
      val pairs = graft.pipeline.Multimodal
        .bandedDistinctHashPairs(dsigOf(n), 64, clamp).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val label = if (c <= 0) "unclamped" else s"c=$c"
      println(f"SKEWCLAMP n=$n%d $label%s pairs=$pairs%d sec=$sec%.1f " +
        f"(n(n-1)/2=${n * (n - 1) / 2}%d, n*c bound=${
          if (c <= 0) -1L else n * c.toLong}%d)")
    }
    spark.stop()
  }
}
