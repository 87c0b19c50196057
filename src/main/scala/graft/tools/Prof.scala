package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Hashing}

object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name%-12s ${(System.nanoTime()-t0)/1e9}%8.2f s  $n")
    }
    t("read")(docs.count())
    t("norm")(docs.select(Dedup.normalizeText(col("text")).alias("n"))
      .agg(sum(length(col("n")))).collect()(0))
    val toks = split(Dedup.normalizeText(col("text")), " ")
    t("tokens")(docs.select(toks.alias("t")).agg(sum(size(col("t")))).collect()(0))
    val sh1 = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", slice(toks, i, lit(2)))))
      .otherwise(array(concat_ws(" ", toks)))
    t("grams")(docs.select(sh1.alias("s")).agg(sum(size(col("s")))).collect()(0))
    t("distinct")(docs.select(array_distinct(sh1).alias("s")).agg(sum(size(col("s")))).collect()(0))
    t("width1")(docs.select(Dedup.shingles(col("text"), 1).alias("s")).agg(sum(size(col("s")))).collect()(0))
    t("width2new")(docs.select(Dedup.shingles(col("text"), 2).alias("s")).agg(sum(size(col("s")))).collect()(0))
    t("candidates")(Dedup.minhashCandidates(docs, "text", "doc_id", 2, 6, 3, 50).count())
    t("nearDups")(Dedup.nearDuplicates(docs, "text", "doc_id", 2, 6, 3, 0.4, 50).count())
    spark.stop()
  }
}
