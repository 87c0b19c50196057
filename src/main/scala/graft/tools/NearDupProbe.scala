package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot fixture probe for the video near-dup gate: checks the
  * synthesizeAviNearDupPayload constants produce (a) ≥2 shots per clip,
  * (b) every within-class variant pair detected (Hamming ≤ 3 on enough
  * keyframes), (c) zero cross-class pairs — BEFORE the oracle row lands.
  * Usage: run_main.sh graft.tools.NearDupProbe <nDocs> */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 500
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val ids = spark.range(n).select(col("id").alias("doc_id"))
      .repartition(8)
    val pay = graft.pipeline.Video.synthesizeAviNearDupPayload(ids, "doc_id")
    val kf = graft.pipeline.Video.keyframePHashes(pay, "doc_id", "payload")
    val shots = kf.groupBy("doc_id").agg(max("n_shots").alias("ns"))
    println("shot distribution: " +
      shots.groupBy("ns").count().orderBy("ns").collect().mkString(", "))
    val minShots = shots.agg(min("ns")).head().getInt(0)
    println(s"min shots per clip: $minShots")
    val pairs = graft.pipeline.Video.videoNearDupPairs(
      pay, "doc_id", "payload").cache()
    val total = pairs.count()
    val cross = pairs.filter((col("id_a") / 10).cast("long") =!= (col("id_b") / 10).cast("long")).count()
    val within = pairs.filter((col("id_a") / 10).cast("long") === (col("id_b") / 10).cast("long")).count()
    // expected within-class pairs: per class, all C(members,2)
    val expected = ids.select((col("doc_id") / 10).cast("long").alias("cls"))
      .groupBy("cls").count()
      .select(sum(col("count") * (col("count") - 1)) / 2).head().getDouble(0).toLong
    println(s"pairs total=$total within=$within expected=$expected cross=$cross")
    // partial matches (not all shots matched) — want 0 for clean witness
    val partial = pairs.filter(col("n_matched_a") =!= col("n_shots_a") ||
      col("n_matched_b") =!= col("n_shots_b")).count()
    println(s"partial-match pairs: $partial")
    // variant Hamming audit: max hamming between keyframes of variant pairs
    val k2 = kf.select((col("doc_id") / 10).cast("long").alias("cls"), col("doc_id"),
      col("shot_idx"), (shiftleft(col("phash_hi"), 32) + col("phash_lo")).alias("h"))
    val vj = k2.alias("x").join(k2.alias("y"),
        col("x.cls") === col("y.cls") &&
        col("x.shot_idx") === col("y.shot_idx") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(bit_count(expr("x.h ^ y.h")).alias("hd"))
    println("within-class same-shot hamming max: " +
      vj.agg(max("hd")).head().get(0))
    // cross-class audit: min hamming across classes, same or diff shots
    val cj = k2.alias("x").join(k2.alias("y"), col("x.cls") < col("y.cls"))
      .select(bit_count(expr("x.h ^ y.h")).alias("hd"))
    println("cross-class hamming min: " + cj.agg(min("hd")).head().get(0))
    spark.stop()
  }
}
