package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level decomposition of the modified-KN trigram scoring cost
  * (q_lm_mkn3_mat / q_ppl_buckets_mkn): sizes of the occurrence stream
  * vs the model table, then timings of the model build alone, the
  * contribs join chain, and the materialized fold.
  * Usage: Mkn3Profile <sfDir> [cpus] */
object Mkn3Profile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text"))
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    import graft.pipeline.TextAnalysis.normNGrams
    val tg = docs.select(col("doc_id"),
      explode(normNGrams(col("text"), 3)).alias("__t"))
      .select(col("doc_id"), col("__t.w1").alias("w1"),
        col("__t.w2").alias("w2"), col("__t.w3").alias("w3"))
    t("tg occurrences")(tg.count())
    t("tg occurrences again")(tg.count())
    val tm = tg.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).alias("__c3"))
    t("tm distinct trigrams")(tm.count())
    val contribs = graft.pipeline.TextAnalysis.lmModKneserNey3Contribs(
      docs, docs, "text", "doc_id")
    t("mkn3 contribs")(contribs.count())
    t("mkn3 contribs again")(contribs.count())
    t("mkn3 mat face") {
      graft.pipeline.TextAnalysis.lmKneserNey3Finish(
        graft.pipeline.Materializer(contribs, eager = true),
        docs.select(col("doc_id")), "doc_id").count()
    }
    t("ppl_buckets_mkn") {
      graft.pipeline.TextAnalysis.pplBucketsByThreshold(
        graft.pipeline.TextAnalysis.lmModKneserNey3Score(
          docs, "text", "doc_id"), "doc_id", "n_trigrams").count()
    }
    spark.stop()
  }
}
