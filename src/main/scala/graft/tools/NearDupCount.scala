package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Gate probe: near-dup pair OUTPUT cardinality at an sf dir — the
  * denominator for the "wall tracks output" scale claim (pair listing is
  * inherently quadratic in clique size; replica-scale pattern collisions
  * grow cliques by construction). Usage: NearDupCount <sfdir> */
object NearDupCount {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).repartition(32)
    val v = graft.pipeline.Video.videoNearDupPairs(
      graft.pipeline.Video.synthesizeAviNearDupPayload(docs, "doc_id"),
      "doc_id", "payload").count()
    val a = graft.pipeline.Multimodal.audioNearDupPairs(
      graft.pipeline.Multimodal.synthesizeWavNearDupPayload(docs, "doc_id"),
      "doc_id", "payload").count()
    println(s"NDCOUNT dir=$dir video_pairs=$v audio_pairs=$a")
    spark.stop()
  }
}
