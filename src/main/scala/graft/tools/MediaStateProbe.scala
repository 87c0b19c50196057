package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Gate probe: fingerprintOwnership's state cardinality at a given sf dir
  * — one state row per distinct (modality, fp, n_units) content group of
  * the media-dedup fixture. The media analogue of the novelty-state
  * growth number (SURVEY §21.3). Usage: MediaStateProbe <sfdir> */
object MediaStateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).repartition(32)
    val fps = graft.pipeline.Multimodal.mediaFingerprints(
      graft.pipeline.Multimodal.synthesizeMediaDedupPayload(docs, "doc_id"),
      "doc_id", "payload")
    val state = fps.select(col("modality"), col("fp"), col("n_units"))
      .distinct()
    val byMod = state.groupBy("modality").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(", ")
    println(s"STATE dir=$dir groups=${state.count()} ($byMod) " +
      s"docs=${docs.count()}")
    spark.stop()
  }
}
